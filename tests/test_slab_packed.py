"""packed8 blend-slab format (ops/tiling.py _packed8_slab + blend_pallas
_slab_views): the half-size int32 slab for megapoint-scale inference.

Contract under test:
1. u/v/conic/logw ride as exact f32 bitcasts - splat SHAPES and alphas are
   bit-identical to wide16.
2. colors/depth carry ONE round-to-nearest bf16 quantization; the kernel's
   unpack reproduces those bf16 values exactly, so packed8 output ==
   wide16 output computed from bf16-pre-rounded colors, bit for bit.
3. end-to-end rgb_only rasterize with packed8 stays within bf16 color
   tolerance of the exact path, and auto-resolution picks the format by
   point count.
"""

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas as BP
from taichi_3d_gaussian_splatting_tpu.ops import tiling
from taichi_3d_gaussian_splatting_tpu.ops.projection import (
    compute_point_attributes)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, _resolve_slab_format, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import inverse_SE3_qt

from test_blend_pallas import make_camera, random_scene


def _bf16_round(x):
    return jnp.asarray(x, jnp.float32).astype(jnp.bfloat16).astype(
        jnp.float32)


def _attr_binning(pc, feats, cam, slab_format):
    n = pc.shape[0]
    obj = jnp.zeros((n,), jnp.int32)
    inv = jnp.zeros((n,), jnp.int8)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t_cam = jnp.zeros((1, 3))
    attrs = compute_point_attributes(
        jnp.array(pc), jnp.array(feats), inv, obj,
        *inverse_SE3_qt(q_cam, t_cam), t_cam, cam, 0.1, 100.0)
    logw = jnp.log(jnp.maximum(attrs.rescale, 1e-30)) + jnp.log(
        jnp.maximum(attrs.alpha_after_activation, 1e-30))
    cols = (attrs.u, attrs.v, attrs.conic_a, attrs.conic_b, attrs.conic_c,
            logw, attrs.color_r, attrs.color_g, attrs.color_b, attrs.depth)
    binning = tiling.bin_points_to_tiles(
        attrs.u, attrs.v, attrs.depth, attrs.radius_x, attrs.radius_y,
        attrs.emit, cam, max_tiles_per_point=32, attr_cols=cols,
        slab_format=slab_format)
    return attrs, cols, binning


def test_packed8_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(257,)).astype(np.float32)) * 100.0
    b = jnp.asarray(rng.normal(size=(257,)).astype(np.float32))
    word = tiling.pack_bf16_pair(a, b)
    hi = jax.lax.bitcast_convert_type(word & jnp.int32(-1 << 16),
                                      jnp.float32)
    lo = jax.lax.bitcast_convert_type(word << 16, jnp.float32)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(_bf16_round(a)))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(_bf16_round(b)))


def test_packed8_kernel_bitexact_vs_wide16_with_rounded_colors():
    """packed8 blend == wide16 blend fed bf16-pre-rounded colors/depth,
    on the SAME sorted keys (so unstable-sort ties cannot differ)."""
    cam = make_camera()
    pc, feats = random_scene(90, seed=11)
    attrs, cols, binning = _attr_binning(pc, feats, cam, "packed8")
    assert binning.point_data.dtype == jnp.int32
    assert binning.point_data.shape[0] == BP.PACKED_DATA_ROWS

    # wide16 slab rebuilt from the SAME binning's sorted ids, with the
    # colors/depth pushed through the identical bf16 rounding
    u, v, ca, cb, cc, logw, cr, cg, cb_col, depth = (
        jnp.asarray(c, jnp.float32) for c in cols)
    zeros = jnp.zeros_like(logw)
    rows = jnp.stack([
        u, v, ca, cb, cc, logw, zeros, zeros,
        _bf16_round(cr), _bf16_round(cg), _bf16_round(cb_col),
        _bf16_round(depth), jnp.ones_like(logw), zeros, zeros, zeros,
    ], axis=0)
    wide = rows[:, binning.sorted_point_idx]

    kw = dict(num_tiles=cam.num_tiles,
              tiles_per_row=cam.camera_width // 16, chunk=128)
    out_packed = BP.blend_forward_rgb(
        binning.point_data, binning.tile_starts, binning.tile_ends, **kw)
    out_wide = BP.blend_forward_rgb(
        wide, binning.tile_starts, binning.tile_ends, **kw)
    np.testing.assert_array_equal(np.asarray(out_packed),
                                  np.asarray(out_wide))


def test_packed8_geometry_rows_are_exact_f32():
    cam = make_camera()
    pc, feats = random_scene(70, seed=12)
    _, cols, binning = _attr_binning(pc, feats, cam, "packed8")
    u = jnp.asarray(cols[0], jnp.float32)
    head = jax.lax.bitcast_convert_type(binning.point_data[0:6],
                                        jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(head[0]), np.asarray(u[binning.sorted_point_idx]))
    logw = jnp.asarray(cols[5], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(head[5]), np.asarray(logw[binning.sorted_point_idx]))


def test_rasterize_packed8_close_to_exact():
    cam = make_camera()
    pc, feats = random_scene(120, seed=13, alpha=4.0)
    n = pc.shape[0]
    obj = jnp.zeros((n,), jnp.int32)
    inv = jnp.zeros((n,), jnp.int8)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t_cam = jnp.zeros((1, 3))
    import dataclasses
    base = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                            max_tiles_per_point=32, rgb_only=True)
    img = {}
    for fmt in ("wide16", "packed8"):
        cfg = dataclasses.replace(base, slab_format=fmt)
        img[fmt] = np.asarray(rasterize(
            jnp.array(pc), jnp.array(feats), inv, obj, q_cam, t_cam, cam,
            cfg).image)
    # bf16 color rounding: relative 2^-9 on colors in [0, ~2]; blended
    # output differences stay well below the 1/255 display quantization
    assert np.max(np.abs(img["packed8"] - img["wide16"])) < 3e-3
    assert np.mean(np.abs(img["packed8"] - img["wide16"])) < 1e-3


def test_auto_format_resolution():
    # auto = packed8 at every scale (measured faster everywhere; see
    # _resolve_slab_format); wide16 remains the explicit exact opt-out
    cfg = RasterizerConfig(rgb_only=True)
    assert _resolve_slab_format(cfg, 430_000) == "packed8"
    assert _resolve_slab_format(cfg, 2_080_000) == "packed8"
    forced = RasterizerConfig(rgb_only=True, slab_format="wide16")
    assert _resolve_slab_format(forced, 2_080_000) == "wide16"
