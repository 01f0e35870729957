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
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, cam)
    assert (int(mnu[0]), int(mxu[0]), int(mnv[0]), int(mxv[0])) == (0, 1, 0, 1)


def test_tile_bbox_spanning():
    cam = make_camera()
    uv = jnp.array([[16.0, 16.0]])   # on the corner of 4 tiles
    radii = jnp.array([2.0])
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, cam)
    # covers tiles u in {0,1}, v in {0,1}
    assert (int(mnu[0]), int(mxu[0]), int(mnv[0]), int(mxv[0])) == (0, 2, 0, 2)


def test_tile_bbox_offscreen_left_still_one_tile():
    # reference behavior: a point left of the image is clamped into tile
    # column 0 (reference: GaussianPointCloudRasterisation.py:88-103)
    cam = make_camera()
    uv = jnp.array([[-30.0, 8.0]])
    radii = jnp.array([2.0])
    mnu, mxu, mnv, mxv = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, cam)
    assert (int(mnu[0]), int(mxu[0])) == (0, 1)
    assert int((mxu[0] - mnu[0]) * (mxv[0] - mnv[0])) == 1


def test_min_radius_one_pixel():
    cam = make_camera()
    uv = jnp.array([[15.9, 8.0]])
    radii = jnp.array([0.0])  # clamped to 1 px -> spans tiles 0 and 1 in u
    mnu, mxu, _, _ = tiling.tile_bbox(uv[:, 0], uv[:, 1], radii, cam)
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
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, in_frustum, cam,
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
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, jnp.array([True]), cam,
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
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii, jnp.array([True]), cam,
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
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii,
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
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii,
                                   jnp.ones((n,), bool), cam,
                                   max_tiles_per_point=8,
                                   mid_point_divisor=4)  # pool = 2 entries
    assert int(b.big_point_overflow) == 6
    assert int(b.total_keys) == 8
    assert int(b.tile_cap_overflow) == 24


def test_segment_lengths_match_emitted_keys():
    # segment_lengths must count exactly the keys each point emitted
    # (the backward's segmented reduction depends on this)
    cam = make_camera()
    rng = np.random.default_rng(0)
    n = 40
    t_b = 16
    uv = jnp.array(np.stack([rng.uniform(0, 64, n),
                             rng.uniform(0, 48, n)], 1).astype(np.float32))
    depth = jnp.array(rng.uniform(1, 50, n).astype(np.float32))
    radii = jnp.array(rng.uniform(0.5, 20, n).astype(np.float32))
    b = tiling.bin_points_to_tiles(uv[:, 0], uv[:, 1], depth, radii,
                                   jnp.ones((n,), bool),
                                   cam, max_tiles_per_point=t_b,
                                   big_point_divisor=2,
                                   mid_point_divisor=2)
    big_cap = n // 2
    valid = np.asarray(b.sorted_valid)
    pts = np.asarray(b.sorted_point_idx)[valid]
    seg = np.asarray(b.segment_lengths)
    rank = np.asarray(b.point_pool_rank)
    in_pool = np.asarray(b.point_in_pool)
    per_point = np.zeros(n, np.int64)
    uniq, counts = np.unique(pts, return_counts=True)
    per_point[uniq] = counts
    for i in range(n):
        expected = seg[n + rank[i]] if in_pool[i] else seg[i]
        assert per_point[i] == expected, (i, per_point[i], expected)
    # positions of valid keys fall inside their segment's emission range
    # (tier A: 2 slots at 2i; big pool: t_b slots from 2n; mid pool: 4
    # slots after the big pool)
    a_slots = tiling.TIER_A_SLOTS
    mid_base = a_slots * n + big_cap * t_b
    pos = np.asarray(b.sorted_pos)[valid]
    for p_, i in zip(pos, pts):
        if in_pool[i]:
            if rank[i] < big_cap:
                start = a_slots * n + rank[i] * t_b
                assert start <= p_ < start + t_b
            else:
                start = mid_base + (rank[i] - big_cap) * tiling.MID_SLOTS
                assert start <= p_ < start + tiling.MID_SLOTS
        else:
            assert a_slots * i <= p_ < a_slots * i + a_slots
