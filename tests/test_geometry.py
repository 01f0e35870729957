"""Ray/ellipsoid and ray-generation oracles.

Mirrors the reference's numpy cross-checks over random cases including
intersection-rate agreement (reference: tests/utils_test.py:58-125,160-283).
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops import geometry as G
from taichi_3d_gaussian_splatting_tpu.ops.transforms import inverse_SE3


def _numpy_ray_ellipsoid(o, d, R, t, S):
    inv = np.diag(1.0 / S) @ R.T
    ot = inv @ (o - t)
    dt = inv @ d
    A = max(dt @ dt, 1e-5)
    B = 2 * ot @ dt
    C = ot @ ot - 1
    disc = B * B - 4 * A * C
    if disc < 0:
        return False, None
    s = np.sqrt(max(disc, 0.0))
    t1, t2 = (-B - s) / (2 * A), (-B + s) / (2 * A)
    if t1 < 0 and t2 < 0:
        return False, None
    th = t1 if t1 >= 0 else t2
    p = R @ (np.diag(S) @ (ot + th * dt)) + t
    return True, p


def test_ray_ellipsoid_matches_numpy_over_random_cases():
    rng = np.random.default_rng(0)
    n = 2000
    hits_jax = hits_np = agree = 0
    os_ = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    ds = rng.normal(size=(n, 3)).astype(np.float32)
    ds /= np.linalg.norm(ds, axis=1, keepdims=True)
    Rs = Rotation.random(n, rng).as_matrix().astype(np.float32)
    ts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    Ss = rng.uniform(0.2, 1.5, (n, 3)).astype(np.float32)

    hit, point = G.intersect_ray_with_ellipsoid(
        jnp.array(os_), jnp.array(ds), jnp.array(Rs), jnp.array(ts),
        jnp.array(Ss))
    hit = np.asarray(hit)
    point = np.asarray(point)
    for i in range(n):
        want_hit, want_p = _numpy_ray_ellipsoid(
            os_[i].astype(np.float64), ds[i].astype(np.float64),
            Rs[i].astype(np.float64), ts[i].astype(np.float64),
            Ss[i].astype(np.float64))
        hits_np += want_hit
        hits_jax += bool(hit[i])
        if want_hit == bool(hit[i]):
            agree += 1
            if want_hit:
                np.testing.assert_allclose(point[i], want_p, atol=2e-2)
    # intersection-rate agreement (borderline discriminants may flip in f32)
    assert agree / n > 0.995, agree / n
    assert abs(hits_jax - hits_np) < n * 0.005


def test_point_to_line_vector():
    p = jnp.array([1.0, 1.0, 0.0])
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([1.0, 0.0, 0.0])
    v = np.asarray(G.get_point_to_line_vector(p, o, d))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_ray_generation_consistency_and_reprojection():
    """Rays through pixel centers must reproject to the same pixels
    (the reference's reprojection identity test, utils_test.py:160-283)."""
    h = w = 32
    intr = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    rng = np.random.default_rng(1)
    R = Rotation.from_euler("xyz", [0.2, -0.1, 0.3]).as_matrix()
    T_pc_cam = np.eye(4, dtype=np.float32)
    T_pc_cam[:3, :3] = R
    T_pc_cam[:3, 3] = rng.normal(size=3)

    origin, direction = G.get_ray_origin_and_direction_from_camera(
        jnp.array(T_pc_cam), cam)
    origin = np.asarray(origin)
    direction = np.asarray(direction)
    # march along each ray, project back through the camera
    T_cam_pc = np.asarray(inverse_SE3(jnp.array(T_pc_cam)))
    depth = 3.7
    for (pv, pu) in [(0, 0), (5, 17), (31, 31), (16, 8)]:
        p_world = origin + direction[pv, pu] * depth
        p_cam = T_cam_pc[:3, :3] @ p_world + T_cam_pc[:3, 3]
        uv1 = intr @ p_cam
        uv = uv1[:2] / uv1[2]
        np.testing.assert_allclose(uv, [pu + 0.5, pv + 0.5], atol=2e-3)

    # single-pixel variant agrees with the full-grid one
    o2, d2 = G.get_ray_origin_and_direction_by_uv(
        jnp.float32(17), jnp.float32(5), jnp.array(intr),
        jnp.array(T_cam_pc))
    np.testing.assert_allclose(np.asarray(o2), origin, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), direction[5, 17], atol=1e-5)
