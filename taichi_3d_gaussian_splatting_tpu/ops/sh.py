"""Real spherical harmonics basis, hard-coded to degree 3 (16 coefficients).

Constants and sign conventions match the reference exactly
(reference: SphericalHarmonics.py:10-32; torch mirror utils.py:635-657).
The basis also serves as its own jacobian with respect to the coefficient
vector (reference: SphericalHarmonics.py:45-53).
"""

from __future__ import annotations

import jax.numpy as jnp

NUM_SH_COEFFS = 16

# Number of active coefficients for SH band curriculum masking
# (reference: GaussianPointCloudRasterisation.py:1167-1182).
SH_BAND_TO_NUM_COEFFS = {0: 1, 1: 4, 2: 9, 3: 16}


def sh_basis_from_direction(direction):
    """Directions (..., 3) (not necessarily normalized) -> SH basis (..., 16).

    Normalizes internally, like the reference (SphericalHarmonics.py:13).
    """
    d = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack([
        0.28209479177387814 * one,
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.94617469575755997 * z * z - 0.31539156525251999,
        -1.0925484305920792 * x * z,
        0.54627421529603959 * x * x - 0.54627421529603959 * y * y,
        0.59004358992664352 * y * (-3.0 * x * x + y * y),
        2.8906114426405538 * x * y * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z * z),
        0.3731763325901154 * z * (5.0 * z * z - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z * z),
        1.4453057213202769 * z * (x * x - y * y),
        0.59004358992664352 * x * (-x * x + 3.0 * y * y),
    ], axis=-1)


def evaluate_sh(factors, direction):
    """dot(factors, basis(direction)); factors (..., 16), direction (..., 3)."""
    return jnp.sum(factors * sh_basis_from_direction(direction), axis=-1)


def sh_band_mask(max_band, dtype=jnp.float32):
    """(16,) mask with 1.0 for coefficients active at `max_band`.

    `max_band` may be a traced integer so the SH curriculum
    (reference: GaussianPointTrainer.py:163) doesn't trigger recompiles.
    """
    coeff_band = jnp.array([0, 1, 1, 1, 2, 2, 2, 2, 2,
                            3, 3, 3, 3, 3, 3, 3], dtype=jnp.int32)
    return (coeff_band <= max_band).astype(dtype)


def feature_sh_band_mask(max_band, num_features: int = 56, dtype=jnp.float32):
    """(num_features,) mask that keeps non-SH features plus active SH bands.

    Used to zero gradients of inactive SH bands, mirroring
    `_clear_grad_by_color_max_sh_band`
    (reference: GaussianPointCloudRasterisation.py:1167-1182).
    """
    sh = sh_band_mask(max_band, dtype)
    head = jnp.ones((8,), dtype=dtype)
    return jnp.concatenate([head, sh, sh, sh])[:num_features]
