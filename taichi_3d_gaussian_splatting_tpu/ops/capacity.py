"""Scene-derived capacity budgets for the static tile-binning tiers.

The binning (ops/tiling.py) uses fixed slot budgets - a key budget
(`max_keys`) and a pool ladder (`pool_slots` / `pool_caps`). The reference
never needs this (its CUDA pipeline allocates per frame, reference:
GaussianPointCloudRasterisation.py:927-931); on TPU the budgets must be
static, and hand-tuning them per scene is benchmark-fitting: a scene with
different overlap statistics silently drops work (budget too small) or
wastes sort rows (budget too large).

`auto_capacity_config` derives the budgets from the scene itself: one cheap
jitted probe per representative view runs projection + tile-overlap counting
(no sort, no blend) and returns the per-bucket overlap histogram the ladder
is sized from; the budgets are the per-view maxima times a stated headroom
factor. Callers probe one or a few representative views and recompile once -
the overflow guard downstream still applies (budgets bound, never silence).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo
from .projection import compute_point_attributes
from .tiling import TIER_A_SLOTS, tile_bbox
from .transforms import inverse_SE3_qt

# geometric ladder buckets: bucket i holds points whose bbox covers
# (LADDER[i-1], LADDER[i]] tiles (LADDER[-1] before index 0 = TIER_A_SLOTS).
# 2048 covers any tile grid up to ~2k tiles (976x544 has 2074; clamped to
# num_tiles at resolve time).
LADDER = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


@partial(jax.jit, static_argnames=("cam_hw", "near_plane", "far_plane"))
def _probe_counts(pointcloud, pointcloud_features, point_invalid_mask,
                  point_object_id, q_pointcloud_camera, t_pointcloud_camera,
                  intrinsics, cam_hw, near_plane, far_plane):
    """One view's workload: (emitted_keys, bucket_pops (len(LADDER),),
    max_count) - emitted counts EVERY overlapped tile (no per-point cap), so
    budgets derived from it can cover the scene losslessly."""
    camera_info = CameraInfo(camera_intrinsics=intrinsics,
                             camera_height=cam_hw[0], camera_width=cam_hw[1])
    q_cam, t_cam = inverse_SE3_qt(q_pointcloud_camera, t_pointcloud_camera)
    attrs = compute_point_attributes(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        q_cam, t_cam, t_pointcloud_camera, camera_info,
        near_plane, far_plane, None)
    min_u, max_u, min_v, max_v = tile_bbox(attrs.u, attrs.v, attrs.radius_x,
                                           attrs.radius_y, camera_info)
    count = jnp.where(attrs.emit, (max_u - min_u) * (max_v - min_v), 0)
    emitted = jnp.sum(count)
    lo = TIER_A_SLOTS
    pops = []
    for hi in LADDER:
        pops.append(jnp.sum(((count > lo) & (count <= hi)).astype(jnp.int32)))
        lo = hi
    small_pop = jnp.sum(
        ((count > 0) & (count <= TIER_A_SLOTS)).astype(jnp.int32))
    return emitted, jnp.stack(pops), jnp.max(count), small_pop


def probe_workload(pointcloud, pointcloud_features, point_invalid_mask,
                   point_object_id, views: Sequence[Tuple],
                   camera_info: CameraInfo,
                   config) -> Tuple[int, tuple, int]:
    """Per-view maxima of (emitted_keys, bucket populations, max_count) over
    `views` = [(q (1,4), t (1,3)), ...] probe poses. Uses object id 0's pose
    for every object (probing is approximate by design; headroom absorbs
    it)."""
    emitted = 0
    max_count = 0
    small_pop = 0
    pops = [0] * len(LADDER)
    cam_hw = (camera_info.camera_height, camera_info.camera_width)
    intr = jnp.asarray(camera_info.camera_intrinsics, jnp.float32)
    for q, t in views:
        e, p, mc, sp = _probe_counts(
            pointcloud, pointcloud_features, point_invalid_mask,
            point_object_id, jnp.asarray(q, jnp.float32),
            jnp.asarray(t, jnp.float32), intr, cam_hw,
            float(config.near_plane), float(config.far_plane))
        emitted = max(emitted, int(e))
        max_count = max(max_count, int(mc))
        small_pop = max(small_pop, int(sp))
        p = [int(x) for x in p]
        pops = [max(a, b) for a, b in zip(pops, p)]
    return emitted, tuple(pops), max_count, small_pop


def auto_capacity_config(pointcloud, pointcloud_features, point_invalid_mask,
                         point_object_id, views: Sequence[Tuple],
                         camera_info: CameraInfo, base_config,
                         headroom: float = 1.5,
                         tier_a_compaction: bool = True):
    """Return `base_config` with `max_keys` and the pool ladder
    (`pool_slots` / `pool_caps`) derived from the probed workload x
    `headroom`.

    - the ladder has one pool per geometric bucket (4, 8, 16, ... tiles)
      with a non-empty probed population, each sized to `headroom` x that
      population (rounded up to a multiple of 8; pools for empty buckets
      are dropped - a later frame drifting into one trips the overflow
      guard and re-probing re-adds it);
    - `max_keys` covers `headroom` x the largest probed emission, rounded up
      to the chunk multiple the binning slices at (pool padding sorts last,
      so the budget covers real keys only).

    With geometric slots the padded-sort-row waste is bounded below 2x at
    any scene scale - the log-normal size tail of real checkpoints (a few
    thousand splats covering 50-600 tiles) neither truncates nor explodes
    the emission buffer (see ops/tiling.py).

    Recompile happens naturally when the returned budgets differ from the
    previous ones (the budgets are static jit arguments); the downstream
    overflow guard still counts anything a later frame drops.
    """
    n = int(pointcloud.shape[0])
    emitted, pops, max_count, small_pop = probe_workload(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        views, camera_info, base_config)
    chunk = int(base_config.chunk)
    num_tiles = camera_info.num_tiles

    pool_slots = []
    pool_caps = []
    for hi, pop in zip(LADDER, pops):
        if pop <= 0:
            continue
        slots = min(hi, num_tiles)
        cap = min(max(int(-(-int(pop * headroom) // 8)) * 8, 8), n)
        if pool_slots and slots <= pool_slots[-1]:
            # num_tiles clamp collapsed this bucket into the previous one
            pool_caps[-1] = min(pool_caps[-1] + cap, n)
            continue
        pool_slots.append(slots)
        pool_caps.append(cap)
    if not pool_slots:
        # degenerate scene (every splat fits tier A): keep one minimal pool
        pool_slots, pool_caps = [min(4, num_tiles)], [8]

    max_keys = max(int(emitted * headroom), chunk)
    max_keys = ((max_keys + chunk - 1) // chunk) * chunk
    # tier-A compaction budget: 1-2-tile splats get headroom x the probed
    # population of pool entries instead of the dense all-N layout, so
    # out-of-frustum points stop contributing padding rows to the key sort
    # (ops/tiling.py tier_a_cap). Capped at n, where the dense layout is
    # used anyway.
    #
    # DEFAULT ON (measured, round 5, v5e). History: with pool metadata
    # looked up through a 5-column pool-table gather, tier A routed through
    # the category sort LOST (430k: 71.5 FPS with vs 74.1 without - the
    # added gather indices cost more than the removed sort padding, xprof
    # trace tiling.py). With pool_meta='packed' (metadata carried as int32
    # payload operands of the already-needed category sort, ~0.7 ns/row
    # per operand) the gather is gone and the compaction's sort-row saving
    # stands alone: 430k 77.84 FPS with vs 74.33 without (+4.7%, the
    # margin that puts the bench at 1.234x the RTX-3090 bar); 2.08M
    # neutral-to-positive. bench.py BENCH_TIER_A=0 restores the dense
    # all-N tier-A layout for A/B.
    tier_a_cap = (min(max(int(-(-int(small_pop * headroom) // 8)) * 8, 8), n)
                  if tier_a_compaction else 0)
    return dataclasses.replace(
        base_config,
        max_keys=max_keys,
        pool_slots=tuple(pool_slots),
        pool_caps=tuple(pool_caps),
        tier_a_cap=tier_a_cap,
    )
