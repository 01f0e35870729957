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
    emitted, pops, max_count, small_pop = probe_workload(
        pc, feats, invalid, obj, [(q, t)], cam, base)
    assert small_pop >= 0
    assert emitted > 0 and sum(pops) > 0  # the fixture exercises the pools
    # the ladder covers every non-empty bucket with headroom
    from taichi_3d_gaussian_splatting_tpu.ops.capacity import LADDER
    assert cfg.pool_slots == tuple(sorted(cfg.pool_slots))
    for hi, pop in zip(LADDER, pops):
        if pop <= 0:
            continue
        covering = [c for s, c in zip(cfg.pool_slots, cfg.pool_caps)
                    if s >= min(hi, cam.num_tiles)]
        assert covering and covering[0] >= pop, (hi, pop, cfg.pool_slots)
    # the largest probed bbox fits the top tier (no truncation)
    assert max(cfg.pool_slots) >= min(max_count, cam.num_tiles)
    assert cfg.max_keys >= emitted
    assert cfg.max_keys % cfg.chunk == 0

    result = rasterize(pc, feats, invalid, obj, q, t, cam, cfg)
    assert int(result.aux.key_overflow) == 0
    assert int(result.aux.big_point_overflow) == 0
    # with the huge tier auto-sized, NOTHING is dropped on the probed view
    assert int(result.aux.tile_cap_overflow) == 0
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
    e_near = probe_workload(pc, feats, invalid, obj, [(q, near)], cam,
                            base)[0]
    e_both = probe_workload(pc, feats, invalid, obj,
                            [(q, far), (q, near)], cam, base)[0]
    assert e_both == e_near  # max over views, not the last view


def test_huge_tier_render_matches_wide_cap_render():
    """A scene with splats past the tier-B cap must render IDENTICALLY via
    the huge tier and via a plainly-large max_tiles_per_point - the tier is
    a capacity layout, not an approximation. Depths are spaced > one
    quantization bucket so the unstable sort has no ties (CLAUDE.md)."""
    import jax
    h = w = 64
    intr = np.array([[55.0, 0, w / 2], [0, 55.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    rng = np.random.default_rng(5)
    n = 24
    pc = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                   2.0 + 0.11 * np.arange(n)], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, 0.0, (n, 3))  # many past 8 tiles
    feats[:, 7] = 1.0
    feats[:, 8] = rng.uniform(-2, 2, n)
    feats[:, 24] = rng.uniform(-2, 2, n)
    feats[:, 40] = rng.uniform(-2, 2, n)
    pc, feats = jnp.asarray(pc), jnp.asarray(feats)
    invalid = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    qc = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    tc = jnp.zeros((1, 3))

    base = dict(near_plane=0.2, far_plane=100.0, depth_to_sort_key_scale=100.0,
                mid_point_divisor=1, big_point_divisor=1)
    wide = RasterizerConfig(max_tiles_per_point=16, **base)
    tiered = RasterizerConfig(max_tiles_per_point=8,
                              max_tiles_per_huge_point=16,
                              huge_pool_size=n, **base)

    def render_and_grad(cfg):
        def f(p, ft):
            r = rasterize(p, ft, invalid, obj, qc, tc, cam, cfg)
            return jnp.sum(r.image * jnp.cos(jnp.arange(3.0))), r.image
        (loss, img), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(pc, feats)
        return img, grads

    img_w, (gp_w, gf_w) = render_and_grad(wide)
    img_t, (gp_t, gf_t) = render_and_grad(tiered)
    r_w = rasterize(pc, feats, invalid, obj, qc, tc, cam, wide)
    r_t = rasterize(pc, feats, invalid, obj, qc, tc, cam, tiered)
    for r in (r_w, r_t):
        assert int(r.aux.tile_cap_overflow) == 0
        assert int(r.aux.big_point_overflow) == 0
    assert int(r_t.aux.total_keys) == int(r_w.aux.total_keys)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_w),
                               atol=1e-6)
    # gradients route through the larger scan bound identically (f32
    # reassociation within a point's key segment is the only slack)
    np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_w),
                               rtol=1e-4, atol=1e-6)


def test_pool_ladder_render_matches_wide_cap_render():
    """An explicit geometric pool ladder must render and differentiate
    IDENTICALLY to one plainly-large tier - the ladder is a capacity
    layout, not an approximation. Tie-free depths (one per quantization
    bucket), overflow-free pools (CLAUDE.md)."""
    import jax
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        rasterize_with_vjp)
    h = w = 64
    intr = np.array([[55.0, 0, w / 2], [0, 55.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    rng = np.random.default_rng(11)
    n = 48
    pc = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                   2.0 + 0.07 * np.arange(n)], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    # spread sizes across ladder buckets: tiny to full-grid
    feats[:, 4:7] = rng.uniform(-3.0, 0.3, (n, 3))
    feats[:, 7] = 1.0
    for base_col in (8, 24, 40):
        feats[:, base_col] = rng.uniform(-2, 2, n)
    pc, feats = jnp.asarray(pc), jnp.asarray(feats)
    invalid = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    qc = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    tc = jnp.zeros((1, 3))

    base = dict(near_plane=0.2, far_plane=100.0,
                depth_to_sort_key_scale=100.0)
    wide = RasterizerConfig(max_tiles_per_point=16,
                            mid_point_divisor=1, big_point_divisor=1, **base)
    ladder = RasterizerConfig(pool_slots=(4, 8, 16),
                              pool_caps=(n, n, n), **base)

    def run(cfg):
        result, vjp_fn = rasterize_with_vjp(pc, feats, invalid, obj, qc, tc,
                                            cam, cfg)
        gp, gf, _ = vjp_fn(jnp.ones_like(result.image))
        assert int(result.aux.tile_cap_overflow) == 0
        assert int(result.aux.big_point_overflow) == 0
        return result, gp, gf

    r_w, gp_w, gf_w = run(wide)
    r_l, gp_l, gf_l = run(ladder)
    assert int(r_l.aux.total_keys) == int(r_w.aux.total_keys)
    np.testing.assert_allclose(np.asarray(r_l.image), np.asarray(r_w.image),
                               atol=1e-6)
    # the routing re-sorts per-key gradients by point id; a different tier
    # layout permutes equal-id rows, so per-point sums reassociate in f32
    # (documented contract, ops/rasterizer.py) - tolerance covers that slack
    np.testing.assert_allclose(np.asarray(gp_l), np.asarray(gp_w),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_l), np.asarray(gf_w),
                               rtol=5e-4, atol=1e-5)
