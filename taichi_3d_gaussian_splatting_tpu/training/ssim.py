"""SSIM in pure jnp, numerically matching pytorch_msssim conventions.

The reference's PSNR/SSIM targets are measured with `pytorch_msssim.ssim`
(reference: LossFunction.py:31-32, GaussianPointTrainer.py:283): gaussian
window 11, sigma 1.5, K1=0.01, K2=0.03, separable depthwise convolution with
VALID padding, mean over everything. This implementation reproduces that so
quality numbers are directly comparable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K1 = 0.01
K2 = 0.03
WIN_SIZE = 11
WIN_SIGMA = 1.5


@functools.lru_cache()
def _gaussian_window(win_size: int = WIN_SIZE, sigma: float = WIN_SIGMA):
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.astype(np.float32)


def _blur(x, win):
    """Separable depthwise gaussian filter, VALID padding. x: (B, H, W, C)."""
    c = x.shape[-1]
    win_v = jnp.asarray(win).reshape(-1, 1, 1, 1)       # (K, 1, 1, 1) HWIO
    win_h = jnp.asarray(win).reshape(1, -1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, win_v.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # precision="highest" is load-bearing: TPU convs default to bf16
    # operands, and the sigma = blur(x^2) - mu^2 cancellation then produces
    # negative variances ~4x the SSIM stabilizer C2 (observed SSIM > 10)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(win_v, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(win_h, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x


def ssim(img1, img2, data_range: float = 1.0):
    """Mean SSIM. Inputs (H, W, C) or (B, H, W, C), channel-last."""
    if img1.ndim == 3:
        img1 = img1[None]
    if img2.ndim == 3:
        img2 = img2[None]
    win = _gaussian_window()
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map)


def psnr(img1, img2, data_range: float = 1.0):
    """10 log10(range^2 / mse) (reference: GaussianPointTrainer.py:281-282)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(data_range * data_range / mse)
