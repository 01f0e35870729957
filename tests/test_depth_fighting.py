"""Depth-fighting fixtures for the quantized sort key (VERDICT round-2 #10).

The binning packs `tile | depth_q` into one int32 sort key, so depth gets
~`31 - ceil(log2(num_tiles+1))` bits after quantization by
`depth_to_sort_key_scale` (ops/tiling.py) - coarser than the reference's
dedicated 32-bit depth field (reference:
GaussianPointCloudRasterisation.py:131-173 packs tile<<32 | f32-bits into
int64). The contract these tests pin, in the reference's own harshest
published regime (config/tat_truck.yaml: depth_to_sort_key_scale=10,
far_plane=2000 - quantization buckets 0.1 units deep):

1. points whose depths differ by >= one quantization bucket ALWAYS blend
   in true geometric order (validated against an analytic composite that
   knows nothing about the binning);
2. points inside the same bucket are ties - either order is within
   contract (same as the reference's unstable torch.sort on equal keys) -
   and the render must equal one of the permutation composites exactly;
3. when the quantized depth saturates its bit budget (depth_q clips to the
   max bucket), saturated points tie instead of corrupting neighbouring
   tile keys.
"""

import itertools

import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)

H = W = 64
F = 50.0
INTR = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
CAM = CameraInfo(camera_intrinsics=INTR, camera_height=H, camera_width=W)
# the tat_truck regime: 0.1-unit depth buckets. Pools sized to hold every
# point (divisor 1): exactness fixtures must be overflow-free, or dropped
# tiles show up as blend differences (CLAUDE.md)
TRUCK_CFG = RasterizerConfig(near_plane=0.4, far_plane=2000.0,
                             depth_to_sort_key_scale=10.0,
                             max_tiles_per_point=32,
                             mid_point_divisor=1, big_point_divisor=1)

ALPHA_SKIP = 1.0 / 255.0
ALPHA_CLAMP = 0.99
T_SAT = 1e-4


def _stack_scene(depths, alpha_logit=1.0):
    """One gaussian per depth, all on the optical axis (they overlap on the
    center pixels), each with a distinct DC color; constant IMAGE-SPACE size
    (log-scale grows with depth) so every layer covers the same pixels."""
    n = len(depths)
    pc = np.zeros((n, 3), np.float32)
    pc[:, 2] = depths
    feats = np.zeros((n, 56), np.float32)
    feats[:, 3] = 1.0  # identity quat
    for i, d in enumerate(depths):
        feats[i, 4:7] = np.log(0.04 * d)  # ~2 px sigma at any depth
    feats[:, 7] = alpha_logit
    rng = np.random.default_rng(7)
    feats[:, 8] = rng.uniform(-3, 3, n)    # r DC
    feats[:, 24] = rng.uniform(-3, 3, n)   # g DC
    feats[:, 40] = rng.uniform(-3, 3, n)   # b DC
    return pc, feats


def _render(pc, feats, cfg=TRUCK_CFG, only=None):
    n = pc.shape[0]
    invalid = np.zeros((n,), np.int8)
    if only is not None:
        invalid[:] = 1
        invalid[only] = 0
    return rasterize(jnp.asarray(pc), jnp.asarray(feats),
                     jnp.asarray(invalid), jnp.zeros((n,), jnp.int32),
                     jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.zeros((1, 3)),
                     CAM, cfg)


def _alpha_color_maps(pc, feats, cfg=TRUCK_CFG):
    """Per-point standalone alpha map (H, W) and solid color (3,), measured
    one point at a time - knows nothing about sort keys or binning."""
    alphas, colors = [], []
    for i in range(pc.shape[0]):
        r = _render(pc, feats, cfg, only=i)
        a = np.asarray(r.aux.pixel_accumulated_alpha)
        colors.append(1.0 / (1.0 + np.exp(
            -0.28209479177387814 * feats[i, [8, 24, 40]])))
        alphas.append(a)
    return np.stack(alphas), np.stack(colors)


def _composite(alpha_maps, colors, order):
    """Analytic front-to-back composite with the blend contract's skip /
    clamp / saturation rules (ops/blend_reference.py docstring)."""
    hw = alpha_maps.shape[1:]
    T = np.ones(hw, np.float64)
    img = np.zeros(hw + (3,), np.float64)
    saturated = np.zeros(hw, bool)
    for i in order:
        a = alpha_maps[i].astype(np.float64)
        a = np.where(a < ALPHA_SKIP, 0.0, np.minimum(a, ALPHA_CLAMP))
        next_T = T * (1.0 - a)
        sat_trigger = (a > 0) & (next_T < T_SAT)
        contribute = (a > 0) & ~saturated & ~sat_trigger
        w = np.where(contribute, a * T, 0.0)
        img += w[..., None] * colors[i]
        T = np.where(contribute, next_T, T)
        saturated |= sat_trigger
    return img.astype(np.float32)


def test_bucket_separated_depths_blend_in_true_order():
    """Depths spaced 1.5 buckets apart, shuffled in memory, must composite
    in geometric order - z-fighting across buckets must not happen."""
    rng = np.random.default_rng(3)
    depths = 5.0 + 0.15 * np.arange(8)
    perm = rng.permutation(8)
    pc, feats = _stack_scene(depths[perm])

    img = np.asarray(_render(pc, feats).image)
    alpha_maps, colors = _alpha_color_maps(pc, feats)
    true_order = np.argsort(depths[perm])
    expected = _composite(alpha_maps, colors, true_order)
    np.testing.assert_allclose(img, expected, atol=5e-5)

    # the order genuinely matters on this fixture: the reversed composite
    # must NOT match, or the assertion above is vacuous
    wrong = _composite(alpha_maps, colors, true_order[::-1])
    assert np.abs(wrong - expected).max() > 0.05


def test_same_bucket_ties_stay_within_contract():
    """Two points 0.04 units apart (same 0.1-unit bucket): either order is
    allowed, but the render must equal ONE of the two composites - a tie
    must not produce a third, corrupted result."""
    pc, feats = _stack_scene([7.005, 7.045], alpha_logit=2.0)
    img = np.asarray(_render(pc, feats).image)
    alpha_maps, colors = _alpha_color_maps(pc, feats)
    candidates = [_composite(alpha_maps, colors, order)
                  for order in itertools.permutations(range(2))]
    errs = [np.abs(img - c).max() for c in candidates]
    assert min(errs) < 5e-5, errs
    # the two orders are visibly different, so the check is not vacuous
    assert np.abs(candidates[0] - candidates[1]).max() > 0.05


def test_saturated_depth_quantization_ties_not_corruption():
    """An absurd depth_to_sort_key_scale clips depth_q to its bit budget:
    both points land in the max bucket. The contract degrades to a tie -
    the image still equals one of the permutation composites, and keys
    never spill into another tile's range."""
    cfg = RasterizerConfig(near_plane=0.4, far_plane=2000.0,
                           depth_to_sort_key_scale=1e9,
                           max_tiles_per_point=32,
                           mid_point_divisor=1, big_point_divisor=1)
    pc, feats = _stack_scene([5.0, 6.0], alpha_logit=2.0)
    img = np.asarray(_render(pc, feats, cfg).image)
    assert np.isfinite(img).all()
    alpha_maps, colors = _alpha_color_maps(pc, feats, cfg)
    candidates = [_composite(alpha_maps, colors, order)
                  for order in itertools.permutations(range(2))]
    errs = [np.abs(img - c).max() for c in candidates]
    assert min(errs) < 5e-5, errs
