"""Scene-derived capacity budgets (ops/capacity.py): the probe must size the
tiers so nothing overflows on the probed view, without hand-tuning."""

import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.capacity import (
    auto_capacity_config, probe_workload)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)


def _scene(n=800, seed=3):
    rng = np.random.default_rng(seed)
    pc = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                   rng.uniform(1.5, 8.0, n)], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    # heavy-tailed sizes: a few big splats exercise the big pool
    feats[:, 4:7] = rng.normal(-2.5, 0.8, (n, 3))
    feats[:, 7] = rng.normal(size=n)
    feats[:, 8] = rng.normal(size=n)
    return jnp.array(pc), jnp.array(feats)


def test_auto_budgets_prevent_overflow():
    h = w = 64
    intr = np.array([[55.0, 0, w / 2], [0, 55.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    base = RasterizerConfig(near_plane=0.2, far_plane=100.0,
                            max_tiles_per_point=16, rgb_only=True)
    pc, feats = _scene()
    n = pc.shape[0]
    invalid = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t = jnp.zeros((1, 3))

    cfg = auto_capacity_config(pc, feats, invalid, obj, [(q, t)], cam, base,
                               headroom=1.2)
    emitted, n_big, n_mid = probe_workload(pc, feats, invalid, obj, [(q, t)],
                                           cam, base)
    assert emitted > 0 and n_big > 0  # the fixture must exercise the pools
    # pools actually fit the probed population with headroom
    assert n // cfg.big_point_divisor >= n_big
    assert n // cfg.mid_point_divisor >= n_mid
    assert cfg.max_keys >= emitted
    assert cfg.max_keys % cfg.chunk == 0

    result = rasterize(pc, feats, invalid, obj, q, t, cam, cfg)
    assert int(result.aux.key_overflow) == 0
    assert int(result.aux.big_point_overflow) == 0
    assert int(result.aux.tile_cap_overflow) >= 0  # capped by config choice
    # probe's emission estimate matches the binning's own count
    assert int(result.aux.total_keys) == emitted


def test_auto_budgets_multi_view_takes_max():
    h = w = 64
    intr = np.array([[55.0, 0, w / 2], [0, 55.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    base = RasterizerConfig(near_plane=0.2, far_plane=100.0,
                            max_tiles_per_point=16)
    pc, feats = _scene()
    n = pc.shape[0]
    invalid = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    near = jnp.zeros((1, 3))
    far = jnp.array([[0.0, 0.0, -6.0]])  # camera pulled back: fewer tiles hit
    e_near, _, _ = probe_workload(pc, feats, invalid, obj, [(q, near)], cam,
                                  base)
    e_both, _, _ = probe_workload(pc, feats, invalid, obj,
                                  [(q, far), (q, near)], cam, base)
    assert e_both == e_near  # max over views, not the last view
