"""End-to-end oracle render: projection -> binning -> scan blend.

Mirrors the reference's two-point known-geometry render smoke test
(reference: tests/GaussianPointCloudRasterisation_test.py:152-205) plus
saturation/skip semantics checks the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops import tiling
from taichi_3d_gaussian_splatting_tpu.ops.blend_reference import blend_reference
from taichi_3d_gaussian_splatting_tpu.ops.projection import compute_point_attributes
from taichi_3d_gaussian_splatting_tpu.ops import gaussian as G


def make_camera(w=32, h=32, f=30.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return CameraInfo(camera_intrinsics=K, camera_height=h, camera_width=w)


def make_features(n, rng, alpha=3.0, scale=-1.5):
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = scale
    feats[:, 7] = alpha
    feats[:, 8] = 3.0    # bright DC for R
    feats[:, 24] = 0.0
    feats[:, 40] = -3.0  # dark B
    return feats


def render(pointcloud, feats, cam, invalid=None, t_cap=16):
    n = pointcloud.shape[0]
    if invalid is None:
        invalid = np.zeros((n,), np.int8)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t_cam = jnp.array([[0.0, 0.0, 0.0]])
    attrs = compute_point_attributes(
        jnp.array(pointcloud), jnp.array(feats), jnp.array(invalid),
        jnp.zeros((n,), jnp.int32), q_cam, t_cam, t_cam, cam,
        near_plane=0.1, far_plane=100.0)
    binning = tiling.bin_points_to_tiles(
        attrs.u, attrs.v, attrs.depth, attrs.radius_x, attrs.radius_y, attrs.in_frustum, cam,
        max_tiles_per_point=t_cap)
    out = blend_reference(
        binning.sorted_point_idx, binning.sorted_tile_id, binning.sorted_valid,
        attrs.uv, attrs.conic_and_rescale, attrs.alpha_after_activation,
        attrs.color, attrs.depth, cam)
    return attrs, binning, out


def test_single_point_renders_at_projection():
    cam = make_camera()
    rng = np.random.default_rng(0)
    pc = np.array([[0.0, 0.0, 2.0]], np.float32)
    feats = make_features(1, rng)
    attrs, binning, out = render(pc, feats, cam)
    img = np.asarray(out.image)
    # brightest red pixel at the image center (uv = (16,16) -> pixel 15/16)
    r = img[:, :, 0]
    iy, ix = np.unravel_index(np.argmax(r), r.shape)
    assert abs(ix - 15.5) <= 1 and abs(iy - 15.5) <= 1
    assert r.max() > 0.5
    # red >> blue everywhere it's lit (DC 3 vs -3 through sigmoid)
    assert img[iy, ix, 0] > img[iy, ix, 2] + 0.3
    # depth at the center equals the point depth
    assert abs(float(out.depth[iy, ix]) - 2.0) < 1e-3
    assert int(out.valid_point_count[iy, ix]) == 1


def test_occlusion_front_to_back():
    cam = make_camera()
    rng = np.random.default_rng(1)
    pc = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]], np.float32)
    feats = make_features(2, rng, alpha=8.0, scale=-0.5)  # near-opaque
    feats[0, 8] = 5.0; feats[0, 24] = -5.0; feats[0, 40] = -5.0  # front: red
    feats[1, 8] = -5.0; feats[1, 24] = 5.0; feats[1, 40] = -5.0  # back: green
    _, _, out = render(pc, feats, cam)
    img = np.asarray(out.image)
    c = img[16, 16]
    # front point wins; sigmoid(5 * SH_C0) ~ 0.80 caps the channel value
    assert c[0] > 0.75 and c[1] < 0.25
    # depth dominated by front point
    assert abs(float(out.depth[16, 16]) - 2.0) < 0.05


def test_saturation_stops_blending():
    cam = make_camera()
    rng = np.random.default_rng(2)
    # stack of many opaque points: transmittance saturates, valid count stops
    n = 40
    pc = np.stack([np.zeros(n), np.zeros(n), np.linspace(2, 3, n)], 1).astype(np.float32)
    feats = make_features(n, rng, alpha=8.0, scale=-0.5)
    _, _, out = render(pc, feats, cam, )
    # with near-opaque points the 1e-4 transmittance cutoff stops blending
    # long before all 40 points are visited (reference: :457-460); the
    # saturating point itself does not contribute, so T stays >= 1e-4.
    assert int(out.valid_point_count[16, 16]) < n
    assert float(out.accumulated_alpha[16, 16]) > 0.98
    assert float(out.accumulated_alpha[16, 16]) <= 1.0 - 1e-4 + 1e-7


def test_invalid_points_not_rendered():
    cam = make_camera()
    rng = np.random.default_rng(3)
    pc = np.array([[0.0, 0.0, 2.0]], np.float32)
    feats = make_features(1, rng)
    _, _, out = render(pc, feats, cam, invalid=np.array([1], np.int8))
    assert float(np.abs(np.asarray(out.image)).max()) == 0.0


def test_blend_is_differentiable_and_grads_are_finite():
    cam = make_camera(16, 16)
    rng = np.random.default_rng(4)
    pc = np.array([[0.0, 0.0, 2.0], [0.2, 0.1, 3.0]], np.float32)
    feats = make_features(2, rng)

    def loss_fn(pc_j, feats_j):
        attrs = compute_point_attributes(
            pc_j, feats_j, jnp.zeros((2,), jnp.int8), jnp.zeros((2,), jnp.int32),
            jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.zeros((1, 3)),
            jnp.zeros((1, 3)), cam, 0.1, 100.0)
        binning = tiling.bin_points_to_tiles(
            attrs.u, attrs.v, attrs.depth, attrs.radius_x, attrs.radius_y, attrs.in_frustum,
            cam, max_tiles_per_point=16)
        out = blend_reference(
            binning.sorted_point_idx, binning.sorted_tile_id,
            binning.sorted_valid, attrs.uv, attrs.conic_and_rescale,
            attrs.alpha_after_activation, attrs.color,
            attrs.depth, cam)
        return jnp.sum(out.image ** 2)

    g_pc, g_feats = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.array(pc), jnp.array(feats))
    assert np.isfinite(np.asarray(g_pc)).all()
    assert np.isfinite(np.asarray(g_feats)).all()
    assert float(jnp.abs(g_pc).max()) > 0
    assert float(jnp.abs(g_feats).max()) > 0
    # straight-through quaternion: gradient exists for q components
    assert float(jnp.abs(g_feats[:, 0:4]).max()) > 0


def test_gradient_descent_converges_on_tiny_target():
    """Rasterizer-only convergence smoke, the reference's pattern 3
    (reference: tests/GaussianPointCloudRasterisation_test.py:284-351)."""
    cam = make_camera(16, 16, f=20.0)
    rng = np.random.default_rng(5)
    n = 8
    pc = np.concatenate([rng.uniform(-0.4, 0.4, (n, 2)),
                         rng.uniform(1.5, 2.5, (n, 1))], 1).astype(np.float32)
    feats = make_features(n, rng, alpha=0.5, scale=-1.2)
    feats[:, 8] = rng.normal(size=n)
    feats[:, 24] = rng.normal(size=n)
    feats[:, 40] = rng.normal(size=n)
    target = jnp.array(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

    def loss_fn(pc_j, feats_j):
        attrs = compute_point_attributes(
            pc_j, feats_j, jnp.zeros((n,), jnp.int8), jnp.zeros((n,), jnp.int32),
            jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.zeros((1, 3)),
            jnp.zeros((1, 3)), cam, 0.1, 100.0)
        binning = tiling.bin_points_to_tiles(
            attrs.u, attrs.v, attrs.depth, attrs.radius_x, attrs.radius_y, attrs.in_frustum,
            cam, max_tiles_per_point=16)
        out = blend_reference(
            binning.sorted_point_idx, binning.sorted_tile_id,
            binning.sorted_valid, attrs.uv, attrs.conic_and_rescale,
            attrs.alpha_after_activation, attrs.color,
            attrs.depth, cam)
        return jnp.mean((jnp.clip(out.image, 0, 1) - target) ** 2)

    val_and_grad = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    pc_j, feats_j = jnp.array(pc), jnp.array(feats)
    loss0 = None
    for i in range(150):
        loss, (gp, gf) = val_and_grad(pc_j, feats_j)
        if loss0 is None:
            loss0 = float(loss)
        pc_j = pc_j - 3e-3 * gp
        feats_j = feats_j - 0.3 * gf
    assert float(loss) < loss0 * 0.93, (float(loss), loss0)
