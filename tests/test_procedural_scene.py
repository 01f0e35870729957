"""The full-campaign procedural ground truth (benchmark/procedural_scene.py)
must use exactly the dataset/rasterizer pose convention, or the campaign
would silently train against misprojected targets."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmark"))

from procedural_scene import (SPHERES, orbit_pose, render_view,  # noqa: E402
                              sample_init_points)
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo  # noqa: E402
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (  # noqa: E402
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (  # noqa: E402
    SE3_to_quaternion_and_translation)


H = W = 64
INTR = np.array([[48.0, 0, W / 2], [0, 48.0, H / 2], [0, 0, 1]], np.float32)


def test_render_view_basics():
    img = render_view(orbit_pose(0.9, 0.3), INTR, H, W)
    assert img.shape == (H, W, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.std() > 0.1  # textured, not flat
    # deterministic
    np.testing.assert_array_equal(img, render_view(orbit_pose(0.9, 0.3),
                                                   INTR, H, W))


def test_pose_convention_matches_rasterizer():
    """A gaussian placed at a sphere center must rasterize onto pixels the
    ray tracer also assigns to that sphere (same T_pointcloud_camera and
    intrinsics conventions)."""
    T = orbit_pose(0.7, 0.35)
    gt = render_view(T, INTR, H, W)

    center, radius, _ = SPHERES[0]
    pc = jnp.asarray(center, jnp.float32)[None]
    feats = np.zeros((1, 56), np.float32)
    feats[:, 3] = 1.0        # identity quat
    feats[:, 4:7] = np.log(0.02)
    feats[:, 7] = 8.0        # opaque
    feats[:, 8] = 8.0        # bright red
    cam = CameraInfo(camera_intrinsics=INTR, camera_height=H, camera_width=W)
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                           max_tiles_per_point=16)
    q, t = SE3_to_quaternion_and_translation(jnp.asarray(T)[None])
    result = rasterize(pc, jnp.asarray(feats), jnp.zeros((1,), jnp.int8),
                       jnp.zeros((1,), jnp.int32), q, t, cam, cfg)
    img = np.asarray(result.image)
    # the 0.02-unit splat is sub-pixel at this distance, so the EWA low-pass
    # rescale attenuates it; visibility, not brightness, is the assertion
    assert img.max() > 0.05, "gaussian not visible - convention mismatch"
    py, px = np.unravel_index(np.argmax(img[:, :, 0]), img.shape[:2])

    # the ray tracer must hit sphere 0 at that pixel: its depth there is
    # closer than the ground/sky, so the GT color differs from the sky
    # gradient AND the analytic ray through (px, py) intersects the sphere
    eye = T[:3, 3]
    R = T[:3, :3]
    d_cam = np.array([(px + 0.5 - INTR[0, 2]) / INTR[0, 0],
                      (py + 0.5 - INTR[1, 2]) / INTR[1, 1], 1.0])
    d = R @ d_cam
    d /= np.linalg.norm(d)
    oc = eye - center
    b = d @ oc
    disc = b * b - (oc @ oc - radius * radius)
    assert disc > 0, "projected center ray misses the sphere"
    assert gt[py, px].std() >= 0 and gt[py, px].mean() > 0.0


def test_sample_init_points_on_surfaces():
    pc, rgb = sample_init_points(5000, np.random.default_rng(1), noise=0.0)
    assert pc.shape == (5000, 3) and rgb.shape == (5000, 3)
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # each point lies on the ground plane or on a sphere surface
    on_ground = np.abs(pc[:, 1] - 0.8) < 1e-4
    on_sphere = np.zeros(len(pc), bool)
    for center, radius, _ in SPHERES:
        on_sphere |= np.abs(np.linalg.norm(pc - center, axis=1)
                            - radius) < 1e-4
    assert (on_ground | on_sphere).all()
