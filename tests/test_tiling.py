"""Tile binning: hand-computed fixtures + invariants.

Mirrors the reference's kernel unit-test pattern with literal fixtures
(reference: tests/GaussianPointCloudRasterisation_test.py:14-51).
"""

import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops import tiling


def make_camera(w=64, h=48):
    K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], np.float32)
    return CameraInfo(camera_intrinsics=K, camera_height=h, camera_width=w)


def test_tile_bbox_basic():
    cam = make_camera()
    uv = jnp.array([[8.0, 8.0]])     # center of tile (0, 0)
    radii = jnp.array([1.0])
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, radii, cam)
    assert (int(mnu[0]), int(mxu[0]), int(mnv[0]), int(mxv[0])) == (0, 1, 0, 1)


def test_tile_bbox_spanning():
    cam = make_camera()
    uv = jnp.array([[16.0, 16.0]])   # on the corner of 4 tiles
    radii = jnp.array([2.0])
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, radii, cam)
    # covers tiles u in {0,1}, v in {0,1}
    assert (int(mnu[0]), int(mxu[0]), int(mnv[0]), int(mxv[0])) == (0, 2, 0, 2)


def test_tile_bbox_offscreen_left_still_one_tile():
    # reference behavior: a point left of the image is clamped into tile
    # column 0 (reference: GaussianPointCloudRasterisation.py:88-103)
    cam = make_camera()
    uv = jnp.array([[-30.0, 8.0]])
    radii = jnp.array([2.0])
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, radii, cam)
    assert (int(mnu[0]), int(mxu[0])) == (0, 1)
    assert int((mxu[0] - mnu[0]) * (mxv[0] - mnv[0])) == 1


def test_min_radius_one_pixel():
    cam = make_camera()
    uv = jnp.array([[15.9, 8.0]])
    radii = jnp.array([0.0])  # clamped to 1 px -> spans tiles 0 and 1 in u
    mnu, mxu, _, _ = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, radii, cam)
    assert (int(mnu[0]), int(mxu[0])) == (0, 2)


def test_bin_points_sorted_by_tile_then_depth():
    cam = make_camera()
    uv = jnp.array([
        [8.0, 8.0],    # tile 0
        [24.0, 8.0],   # tile 1
        [8.0, 8.0],    # tile 0, nearer
    ])
    depth = jnp.array([5.0, 2.0, 1.0])
    radii = jnp.array([1.0, 1.0, 1.0])
    in_frustum = jnp.array([True, True, True])
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii, in_frustum, cam,
                                   max_tiles_per_point=8)
    assert int(b.total_keys) == 3
    assert int(b.tile_cap_overflow) == 0
    valid = np.asarray(b.sorted_valid)
    tiles = np.asarray(b.sorted_tile_id)[valid]
    pts = np.asarray(b.sorted_point_idx)[valid]
    np.testing.assert_array_equal(tiles, [0, 0, 1])
    np.testing.assert_array_equal(pts, [2, 0, 1])  # nearer first within tile
    starts = np.asarray(b.tile_starts)
    ends = np.asarray(b.tile_ends)
    assert starts[0] == 0 and ends[0] == 2
    assert starts[1] == 2 and ends[1] == 3
    assert all(starts[2:] == ends[2:])


def test_bin_points_multi_tile_emission():
    cam = make_camera()
    uv = jnp.array([[16.0, 16.0]])
    depth = jnp.array([3.0])
    radii = jnp.array([2.0])
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii, jnp.array([True]), cam,
                                   max_tiles_per_point=8)
    assert int(b.total_keys) == 4
    valid = np.asarray(b.sorted_valid)
    tiles = sorted(np.asarray(b.sorted_tile_id)[valid].tolist())
    # tiles (u,v) in {0,1}x{0,1}; tiles_per_row = 4
    assert tiles == [0, 1, 4, 5]


def test_tile_cap_overflow_reported():
    cam = make_camera()
    uv = jnp.array([[32.0, 24.0]])
    depth = jnp.array([3.0])
    radii = jnp.array([100.0])  # covers all 4x3 = 12 tiles
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii, jnp.array([True]), cam,
                                   max_tiles_per_point=8)
    assert int(b.total_keys) == 8
    assert int(b.tile_cap_overflow) == 4


def test_big_point_pool_overflow_reported():
    # more big points than the tier-B pool: excess points dropped + counted
    cam = make_camera()
    n = 16
    uv = jnp.tile(jnp.array([[32.0, 24.0]]), (n, 1))
    depth = jnp.arange(1, n + 1, dtype=jnp.float32)
    radii = jnp.full((n,), 40.0)  # each covers many tiles -> all "big"
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii,
                                   jnp.ones((n,), bool), cam,
                                   max_tiles_per_point=8,
                                   big_point_divisor=8)  # pool = 2 entries
    assert int(b.big_point_overflow) == 14
    assert int(b.tile_cap_overflow) > 0


def test_mid_point_pool_overflow_reported():
    # more mid points (3..4 tiles) than the tier-M pool: dropped + counted
    cam = make_camera()
    n = 8
    uv = jnp.tile(jnp.array([[16.0, 16.0]]), (n, 1))  # 2x2-tile corner
    depth = jnp.arange(1, n + 1, dtype=jnp.float32)
    radii = jnp.full((n,), 2.0)  # each covers exactly 4 tiles -> all "mid"
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii,
                                   jnp.ones((n,), bool), cam,
                                   max_tiles_per_point=8,
                                   mid_point_divisor=4)  # pool = 2 entries
    assert int(b.big_point_overflow) == 6
    assert int(b.total_keys) == 8
    assert int(b.tile_cap_overflow) == 24


def test_huge_tier_eliminates_tile_cap_overflow():
    # same fixture as test_tile_cap_overflow_reported, but with tier H
    # enabled: the splat covering all 12 tiles emits every one of them
    cam = make_camera()
    uv = jnp.array([[32.0, 24.0]])
    depth = jnp.array([3.0])
    radii = jnp.array([100.0])
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii,
                                   jnp.array([True]), cam,
                                   max_tiles_per_point=8,
                                   max_tiles_per_huge_point=16,
                                   huge_pool_size=4)
    assert int(b.total_keys) == 12
    assert int(b.tile_cap_overflow) == 0
    assert int(b.big_point_overflow) == 0
    valid = np.asarray(b.sorted_valid)
    assert sorted(np.asarray(b.sorted_tile_id)[valid].tolist()) == list(
        range(12))
    np.testing.assert_array_equal(np.asarray(b.point_kept_keys), [12])


def test_huge_tier_pool_overflow_reported():
    # more huge points than the tiny pool: excess dropped + counted, and
    # big-tier points are still binned correctly after the huge prefix
    cam = make_camera()
    n = 6
    uv = jnp.tile(jnp.array([[32.0, 24.0]]), (n, 1))
    depth = jnp.arange(1, n + 1, dtype=jnp.float32)
    # 4 huge (cover 12 tiles each > t_b=8), 2 big (2x3=6 tiles each)
    radii = jnp.array([100.0, 100.0, 100.0, 100.0, 10.0, 10.0])
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii,
                                   jnp.ones((n,), bool), cam,
                                   max_tiles_per_point=8,
                                   big_point_divisor=2,  # big pool = 3
                                   max_tiles_per_huge_point=16,
                                   huge_pool_size=2)
    assert int(b.big_point_overflow) == 2  # 2 huge points past the pool
    # 2 huge x 12 + 2 big x 6 = 36 keys survive
    assert int(b.total_keys) == 36


def test_huge_tier_validation():
    cam = make_camera()
    args = (jnp.zeros((1,)), jnp.zeros((1,)), jnp.ones((1,)),
            jnp.ones((1,)), jnp.ones((1,)), jnp.array([True]), cam)
    import pytest
    with pytest.raises(ValueError, match="max_tiles_per_huge_point"):
        tiling.bin_points_to_tiles(*args, max_tiles_per_point=8,
                                   max_tiles_per_huge_point=8)
    # a clamp below t_b (tiny grid) silently disables the tier instead
    b = tiling.bin_points_to_tiles(*args, max_tiles_per_point=11,
                                   max_tiles_per_huge_point=64)
    assert int(b.total_keys) == 1


def test_point_kept_keys_match_emitted_keys():
    # point_kept_keys must count exactly the keys each point emitted when
    # nothing overflowed (the backward's segment-end cumsum depends on this)
    cam = make_camera()
    rng = np.random.default_rng(0)
    n = 40
    t_b = 16
    uv = jnp.array(np.stack([rng.uniform(0, 64, n),
                             rng.uniform(0, 48, n)], 1).astype(np.float32))
    depth = jnp.array(rng.uniform(1, 50, n).astype(np.float32))
    radii = jnp.array(rng.uniform(0.5, 20, n).astype(np.float32))
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, radii,
                                   jnp.ones((n,), bool),
                                   cam, max_tiles_per_point=t_b,
                                   big_point_divisor=2,
                                   mid_point_divisor=2)
    assert int(b.big_point_overflow) == 0 and int(b.key_overflow) == 0
    valid = np.asarray(b.sorted_valid)
    pts = np.asarray(b.sorted_point_idx)[valid]
    per_point = np.zeros(n, np.int64)
    uniq, counts = np.unique(pts, return_counts=True)
    per_point[uniq] = counts
    np.testing.assert_array_equal(per_point, np.asarray(b.point_kept_keys))
    assert int(b.total_keys) == per_point.sum()


def test_depth_key_precision_matches_reference_ordering():
    # The packed int32 key leaves 19 depth bits at the benchmark resolution
    # (976x544 -> 2074 tiles -> 12 tile bits), vs the reference's full 32
    # bits (reference: GaussianPointCloudRasterisation.py:158-160). Both
    # quantize to int32(depth * depth_to_sort_key_scale); the 19-bit budget
    # only saturates beyond 2^19/scale = 5242 units, far past any realistic
    # far plane. Within the far plane the two orderings must be IDENTICAL
    # (not just equivalent): same quantized values, same ties.
    K = np.array([[581.7, 0, 488.0], [0, 581.7, 272.0], [0, 0, 1]],
                 np.float32)
    cam = CameraInfo(camera_intrinsics=K, camera_height=544,
                     camera_width=976)
    num_tiles = cam.num_tiles
    depth_bits = 31 - int(np.ceil(np.log2(num_tiles + 1)))
    assert depth_bits == 19
    rng = np.random.default_rng(7)
    n = 4096
    # adversarial depths: interleaved near-ties at many scales up to the
    # reference benchmark far plane (1000)
    base = rng.uniform(0.4, 1000.0, n // 2)
    depth = np.concatenate([base, base + rng.uniform(0, 0.02, n // 2)])
    depth = depth.astype(np.float32)
    scale = 100.0
    ref_key = (depth * scale).astype(np.int32)          # reference, 32-bit
    ours = np.clip(ref_key, 0, (1 << depth_bits) - 1)   # ours, 19-bit
    np.testing.assert_array_equal(ours, ref_key)

    # all points into ONE tile: the full binning must order them exactly as
    # the reference's 32-bit key would
    u = jnp.full((n,), 8.0)
    v = jnp.full((n,), 8.0)
    radii = jnp.ones((n,))
    b = tiling.bin_points_to_tiles(
        u, v, jnp.asarray(depth), radii, radii, jnp.ones((n,), bool), cam,
        depth_to_sort_key_scale=scale, max_tiles_per_point=8,
        mid_point_divisor=1, big_point_divisor=1)
    valid = np.asarray(b.sorted_valid)
    got = np.asarray(b.sorted_depth_key)[valid]
    np.testing.assert_array_equal(got, np.sort(ref_key))

    # beyond the 19-bit budget the key saturates (documented coarser
    # tie-break) instead of wrapping into a wrong tile
    far = jnp.array([6000.0, 7000.0], jnp.float32)
    b2 = tiling.bin_points_to_tiles(
        jnp.full((2,), 8.0), jnp.full((2,), 8.0), far, jnp.ones((2,)),
        jnp.ones((2,)), jnp.ones((2,), bool), cam,
        depth_to_sort_key_scale=scale, max_tiles_per_point=8)
    valid2 = np.asarray(b2.sorted_valid)
    assert (np.asarray(b2.sorted_depth_key)[valid2]
            == (1 << depth_bits) - 1).all()
    assert (np.asarray(b2.sorted_tile_id)[valid2] == 0).all()


def test_resolve_pools_edges():
    """Ladder resolution: legacy-knob derivation, clamping merges, and
    validation failures."""
    import pytest
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import (
        MID_SLOTS, resolve_pools, emission_capacity_pools)

    # legacy: mid + big (+ huge when enabled and roomy)
    assert resolve_pools(1600, 10_000, max_tiles_per_point=32,
                         big_point_divisor=16, mid_point_divisor=4) == [
        (4, 400), (32, 100)]
    assert resolve_pools(1600, 10_000, max_tiles_per_point=32,
                         big_point_divisor=16, mid_point_divisor=4,
                         max_tiles_per_huge_point=128,
                         huge_pool_size=64) == [(4, 400), (32, 100),
                                                (128, 64)]
    # huge tier collapsed by a small grid is dropped
    assert resolve_pools(1600, 20, max_tiles_per_point=32,
                         big_point_divisor=16, mid_point_divisor=4,
                         max_tiles_per_huge_point=128, huge_pool_size=64
                         ) == [(4, 400), (20, 100)]
    # explicit ladder: clamped tiers merge, caps add (stays valid at any res)
    assert resolve_pools(100, 4, pool_slots=(4, 8, 16),
                         pool_caps=(10, 20, 30)) == [(4, 60)]
    # caps clamp to n
    assert resolve_pools(8, 10_000, pool_slots=(4,), pool_caps=(99,)) == [
        (4, 8)]
    with pytest.raises(ValueError):
        resolve_pools(100, 100, pool_slots=(8, 4), pool_caps=(1, 1))
    with pytest.raises(ValueError):
        resolve_pools(100, 100, pool_slots=(2,), pool_caps=(1,))
    with pytest.raises(ValueError):
        resolve_pools(100, 100, max_tiles_per_point=MID_SLOTS - 1)
    # emission capacity is chunk-rounded and covers tier A + the ladder
    ec = emission_capacity_pools(100, [(4, 10), (32, 5)], chunk=128)
    assert ec >= 2 * 100 + 4 * 10 + 32 * 5 and ec % 128 == 0


def test_slab_gather_row_matches_col():
    """The row-major fused-transpose slab gather ("row", default) is a pure
    layout change: point_data must be bit-identical to the strided column
    gather ("col") it replaces for speed (benchmark/README round 5)."""
    import numpy as np
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops import tiling

    rng = np.random.default_rng(7)
    n = 300
    u = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 48, n).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
    rx = jnp.asarray(rng.uniform(0.5, 20, n).astype(np.float32))
    ry = jnp.asarray(rng.uniform(0.5, 20, n).astype(np.float32))
    emit = jnp.asarray(rng.random(n) < 0.8)
    intr = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=48,
                     camera_width=64)
    cols = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(10))
    out = {}
    for mode in ("row", "col", "rowb"):
        out[mode] = tiling.bin_points_to_tiles(
            u, v, depth, rx, ry, emit, cam, max_tiles_per_point=16,
            attr_cols=cols, slab_gather=mode)
    for mode in ("row", "rowb"):
        np.testing.assert_array_equal(np.asarray(out[mode].point_data),
                                      np.asarray(out["col"].point_data))
        np.testing.assert_array_equal(np.asarray(out[mode].sorted_key),
                                      np.asarray(out["col"].sorted_key))


def test_tier_a_compaction_matches_dense_layout():
    """tier_a_cap routes 1-2-tile splats through the category sort instead
    of the dense (2, N) grid; on a tie-free fixture (distinct depths) the
    sorted keys, ids, ranges, counters and blend slab must be identical to
    the legacy layout, and invisible points must stop costing sort rows
    (smaller emission capacity)."""
    import numpy as np
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops import tiling

    rng = np.random.default_rng(11)
    n = 400
    u = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 48, n).astype(np.float32))
    depth = jnp.asarray(np.linspace(1, 40, n).astype(np.float32))  # tie-free
    rx = jnp.asarray(rng.uniform(0.5, 18, n).astype(np.float32))
    ry = jnp.asarray(rng.uniform(0.5, 18, n).astype(np.float32))
    emit = jnp.asarray(rng.random(n) < 0.6)
    intr = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=48,
                     camera_width=64)
    cols = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(10))

    def bin_with(cap):
        # drop-free ladder: equivalence needs zero pool drops (unstable
        # category-sort tie order makes WHICH points drop layout-dependent)
        return tiling.bin_points_to_tiles(
            u, v, depth, rx, ry, emit, cam,
            pool_slots=(4, 8, 16), pool_caps=(400, 400, 400),
            depth_to_sort_key_scale=50.0, attr_cols=cols, tier_a_cap=cap)

    dense = bin_with(0)
    compact = bin_with(256)   # cap > population: nothing dropped
    assert int(compact.total_keys) == int(dense.total_keys)
    assert int(compact.big_point_overflow) == 0
    assert int(compact.tile_cap_overflow) == int(dense.tile_cap_overflow)
    # the sorted prefix (valid keys) must agree exactly (tie-free fixture)
    k = int(dense.total_keys)
    np.testing.assert_array_equal(np.asarray(dense.sorted_key[:k]),
                                  np.asarray(compact.sorted_key[:k]))
    np.testing.assert_array_equal(np.asarray(dense.sorted_point_idx[:k]),
                                  np.asarray(compact.sorted_point_idx[:k]))
    np.testing.assert_array_equal(np.asarray(dense.tile_starts),
                                  np.asarray(compact.tile_starts))
    np.testing.assert_array_equal(np.asarray(dense.tile_ends),
                                  np.asarray(compact.tile_ends))
    np.testing.assert_array_equal(
        np.asarray(dense.point_data[:, :k]),
        np.asarray(compact.point_data[:, :k]))
    # invisible/culled points cost zero rows: smaller emission buffer
    assert compact.sorted_valid.shape[0] <= dense.sorted_valid.shape[0]

    # an undersized cap DROPS (counted, never silent)
    tiny = bin_with(8)
    assert int(tiny.big_point_overflow) > 0


def test_pool_meta_packed_matches_gather():
    """pool_meta='packed' carries (min_u, min_v, dv, count) + depth_q as
    category-sort payload operands instead of the legacy 5-column gather;
    on a tie-free fixture every downstream artifact must be identical, for
    both the dense and the compacted tier-A layouts."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops import tiling

    rng = np.random.default_rng(13)
    n = 400
    u = jnp.asarray(rng.uniform(0, 64, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 48, n).astype(np.float32))
    depth = jnp.asarray(np.linspace(1, 40, n).astype(np.float32))  # tie-free
    rx = jnp.asarray(rng.uniform(0.5, 18, n).astype(np.float32))
    ry = jnp.asarray(rng.uniform(0.5, 18, n).astype(np.float32))
    emit = jnp.asarray(rng.random(n) < 0.6)
    intr = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=48,
                     camera_width=64)
    cols = tuple(jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(10))

    def bin_with(meta, cap):
        return tiling.bin_points_to_tiles(
            u, v, depth, rx, ry, emit, cam,
            pool_slots=(4, 8, 16), pool_caps=(400, 400, 400),
            depth_to_sort_key_scale=50.0, attr_cols=cols,
            tier_a_cap=cap, pool_meta=meta)

    for cap in (0, 256):
        g = bin_with("gather", cap)
        p = bin_with("packed", cap)
        assert int(p.total_keys) == int(g.total_keys)
        assert int(p.big_point_overflow) == int(g.big_point_overflow)
        assert int(p.tile_cap_overflow) == int(g.tile_cap_overflow)
        k = int(g.total_keys)
        np.testing.assert_array_equal(np.asarray(g.sorted_key[:k]),
                                      np.asarray(p.sorted_key[:k]))
        np.testing.assert_array_equal(np.asarray(g.sorted_point_idx[:k]),
                                      np.asarray(p.sorted_point_idx[:k]))
        np.testing.assert_array_equal(np.asarray(g.tile_starts),
                                      np.asarray(p.tile_starts))
        np.testing.assert_array_equal(np.asarray(g.tile_ends),
                                      np.asarray(p.tile_ends))
        np.testing.assert_array_equal(np.asarray(g.point_data[:, :k]),
                                      np.asarray(p.point_data[:, :k]))

    # a grid too large for the 31-bit budget must refuse loudly in packed
    # mode (auto falls back to the gather)
    with pytest.raises(ValueError):
        big_cam = CameraInfo(
            camera_intrinsics=np.array([[4000.0, 0, 16384],
                                        [0, 4000.0, 16384], [0, 0, 1]],
                                       np.float32),
            camera_height=32768, camera_width=32768)
        tiling.bin_points_to_tiles(
            u, v, depth, rx, ry, emit, big_cam,
            pool_slots=(4,), pool_caps=(400,), pool_meta="packed")
