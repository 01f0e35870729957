"""Opacity-aware extent bound: culling keys the blend could never use.

The blend skips (with zero gradient) every per-pixel contribution below
ALPHA_SKIP_THRESHOLD = 1/255 (reference: GaussianPointCloudRasterisation.py
:451,634). Projection therefore bounds each splat's bbox at the Mahalanobis
radius where its peak contribution decays to the threshold (capped at the
reference's own 3-sigma box), and fully-invisible splats emit no keys at
all. These tests pin the exactness claim: the tightened binning changes
neither the rendered image nor any gradient versus the wide 3-sigma box.
"""

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops import tiling
from taichi_3d_gaussian_splatting_tpu.ops.blend_reference import blend_reference
from taichi_3d_gaussian_splatting_tpu.ops.gaussian import (
    ALPHA_SKIP_THRESHOLD, COV_LOW_PASS)
from taichi_3d_gaussian_splatting_tpu.ops.projection import (
    compute_point_attributes)


def make_camera(w=64, h=48, f=40.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return CameraInfo(camera_intrinsics=K, camera_height=h, camera_width=w)


def make_scene(n, rng, alpha_logits):
    """Clustered points with distinct depths (tie-free sort keys)."""
    pc = np.stack([rng.uniform(-1.0, 1.0, n), rng.uniform(-0.8, 0.8, n),
                   np.linspace(2.0, 6.0, n) + rng.uniform(0, 0.02, n)],
                  1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.0, -0.5, (n, 3))
    feats[:, 7] = alpha_logits
    feats[:, 8] = rng.normal(size=n)
    feats[:, 24] = rng.normal(size=n)
    feats[:, 40] = rng.normal(size=n)
    return pc, feats


def attrs_of(pc, feats, cam, invalid=None):
    n = pc.shape[0]
    if invalid is None:
        invalid = np.zeros((n,), np.int8)
    return compute_point_attributes(
        jnp.array(pc), jnp.array(feats), jnp.array(invalid),
        jnp.zeros((n,), jnp.int32), jnp.array([[0.0, 0.0, 0.0, 1.0]]),
        jnp.zeros((1, 3)), jnp.zeros((1, 3)), cam, 0.1, 100.0)


def wide_radii(attrs):
    """The pre-bound extents (reference 3-sigma marginals), recovered from
    the conic: conic = inv(cov + COV_LOW_PASS * I)."""
    ca, cb, cc = attrs.conic_a, attrs.conic_b, attrs.conic_c
    det_f = 1.0 / jnp.maximum(ca * cc - cb * cb, 1e-30)
    fa = cc * det_f
    fc = ca * det_f
    rx = 3.0 * jnp.sqrt(jnp.maximum(fa - COV_LOW_PASS, 0.0))
    ry = 3.0 * jnp.sqrt(jnp.maximum(fc - COV_LOW_PASS, 0.0))
    return rx, ry


def render_with(attrs, rx, ry, in_frustum, cam, t_cap=32):
    binning = tiling.bin_points_to_tiles(
        attrs.u, attrs.v, attrs.depth, rx, ry, in_frustum, cam,
        max_tiles_per_point=t_cap)
    out = blend_reference(
        binning.sorted_point_idx, binning.sorted_tile_id, binning.sorted_valid,
        attrs.uv, attrs.conic_and_rescale, attrs.alpha_after_activation,
        attrs.color, attrs.depth, cam)
    return binning, out


def test_bound_never_exceeds_reference_box_and_tightens_translucents():
    cam = make_camera()
    rng = np.random.default_rng(0)
    n = 32
    logits = np.where(rng.random(n) < 0.5, 2.5, -2.0).astype(np.float32)
    pc, feats = make_scene(n, rng, logits)
    a = attrs_of(pc, feats, cam)
    wrx, wry = wide_radii(a)
    vis = np.asarray(a.emit)
    rx = np.asarray(a.radius_x)
    assert (rx[vis] <= np.asarray(wrx)[vis] + 1e-5).all()
    # translucent splats (sigmoid(-2) ~ 0.12 -> r_eff ~ 2.6 sigma) must be
    # strictly tighter than the 3-sigma box wherever the box is the binding
    # constraint (big enough that the filtered/unfiltered gap is small)
    big = vis & (np.asarray(wry) > 3.0) & (logits < 0)
    assert big.any()
    assert (np.asarray(a.radius_y)[big] < np.asarray(wry)[big] * 0.95).all()


def test_culling_is_exact_image_and_gradient():
    cam = make_camera()
    rng = np.random.default_rng(1)
    n = 48
    logits = np.where(rng.random(n) < 0.5, 2.0,
                      rng.uniform(-3.5, -1.5, n)).astype(np.float32)
    pc, feats = make_scene(n, rng, logits)
    # overflow-free fixture (CLAUDE.md: exactness needs no dropped work):
    # moderate scales so even the wide 3-sigma boxes fit the default pools
    feats[:, 4:7] = rng.uniform(-3.0, -1.6, (n, 3))

    def render_image(pc_j, feats_j, wide):
        a = attrs_of(pc_j, feats_j, cam)
        if wide:
            rx, ry = wide_radii(a)
        else:
            rx, ry = a.radius_x, a.radius_y
        _, out = render_with(a, rx, ry, a.emit, cam)
        return out.image

    a = attrs_of(pc, feats, cam)
    wrx, wry = wide_radii(a)
    bin_tight, out_tight = render_with(a, a.radius_x, a.radius_y,
                                       a.emit, cam)
    bin_wide, out_wide = render_with(a, wrx, wry, a.emit, cam)
    assert int(bin_tight.total_keys) < int(bin_wide.total_keys)
    # every culled (key, pixel) pair sits below the blend's skip gate, so
    # the surviving pairs and their blend order are identical: bit-exact
    np.testing.assert_array_equal(np.asarray(out_tight.image),
                                  np.asarray(out_wide.image))
    np.testing.assert_array_equal(np.asarray(out_tight.accumulated_alpha),
                                  np.asarray(out_wide.accumulated_alpha))

    def loss(pc_j, feats_j, wide):
        return jnp.sum(render_image(pc_j, feats_j, wide) ** 2)

    gt = jax.grad(loss, argnums=(0, 1))(jnp.array(pc), jnp.array(feats), False)
    gw = jax.grad(loss, argnums=(0, 1))(jnp.array(pc), jnp.array(feats), True)
    np.testing.assert_array_equal(np.asarray(gt[0]), np.asarray(gw[0]))
    np.testing.assert_array_equal(np.asarray(gt[1]), np.asarray(gw[1]))


def test_invisible_splat_emits_nothing_and_changes_nothing():
    cam = make_camera()
    rng = np.random.default_rng(2)
    n = 8
    logits = np.full(n, 1.5, np.float32)
    logits[3] = -6.5  # sigmoid ~ 1.5e-3 < 1/255: below the blend skip gate
    pc, feats = make_scene(n, rng, logits)
    a = attrs_of(pc, feats, cam)
    # the invisible splat stays in the controller's frustum mask (the
    # reference's point_in_camera_mask is pure frustum) but must not emit
    assert bool(a.in_frustum[3])
    assert not bool(a.emit[3])
    peak = float(a.rescale[3] * a.alpha_after_activation[3])
    assert peak < ALPHA_SKIP_THRESHOLD
    _, out = render_with(a, a.radius_x, a.radius_y, a.emit, cam)
    invalid = np.zeros((n,), np.int8)
    invalid[3] = 1
    a2 = attrs_of(pc, feats, cam, invalid=invalid)
    _, out2 = render_with(a2, a2.radius_x, a2.radius_y, a2.emit, cam)
    np.testing.assert_array_equal(np.asarray(out.image),
                                  np.asarray(out2.image))
