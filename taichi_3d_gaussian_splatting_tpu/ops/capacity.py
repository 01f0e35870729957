"""Scene-derived capacity budgets for the static tile-binning tiers.

The binning (ops/tiling.py) uses fixed slot budgets - a key budget
(`max_keys`) and two point pools (`mid_point_divisor`, `big_point_divisor`).
The reference never needs this (its CUDA pipeline allocates per frame,
reference: GaussianPointCloudRasterisation.py:927-931); on TPU the budgets
must be static, and hand-tuning them per scene is benchmark-fitting: a scene
with different overlap statistics silently drops work (budget too small) or
wastes sort rows (budget too large).

`auto_capacity_config` derives the budgets from the scene itself: one cheap
jitted probe per representative view runs projection + tile-overlap counting
(no sort, no blend) and returns the three workload counters the tiers are
sized from; the budgets are their maxima times a stated headroom factor.
Callers probe one or a few representative views and recompile once - the
overflow guard downstream still applies (budgets bound, never silence).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo
from .projection import compute_point_attributes
from .tiling import MID_SLOTS, TIER_A_SLOTS, tile_bbox
from .transforms import inverse_SE3_qt


@partial(jax.jit, static_argnames=("cam_hw", "near_plane", "far_plane",
                                   "max_tiles_per_point"))
def _probe_counts(pointcloud, pointcloud_features, point_invalid_mask,
                  point_object_id, q_pointcloud_camera, t_pointcloud_camera,
                  intrinsics, cam_hw, near_plane, far_plane,
                  max_tiles_per_point):
    """One view's workload counters:
    (emitted_keys, n_big, n_mid, n_huge, max_count) scalars - emitted counts
    EVERY overlapped tile (no per-point cap), so budgets derived from it can
    cover the scene losslessly."""
    camera_info = CameraInfo(camera_intrinsics=intrinsics,
                             camera_height=cam_hw[0], camera_width=cam_hw[1])
    q_cam, t_cam = inverse_SE3_qt(q_pointcloud_camera, t_pointcloud_camera)
    attrs = compute_point_attributes(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        q_cam, t_cam, t_pointcloud_camera, camera_info,
        near_plane, far_plane, None)
    min_u, max_u, min_v, max_v = tile_bbox(attrs.u, attrs.v, attrs.radius_x,
                                           attrs.radius_y, camera_info)
    count = jnp.where(attrs.in_frustum, (max_u - min_u) * (max_v - min_v), 0)
    emitted = jnp.sum(count)
    n_big = jnp.sum(((count > MID_SLOTS)
                     & (count <= max_tiles_per_point)).astype(jnp.int32))
    n_mid = jnp.sum(((count > TIER_A_SLOTS)
                     & (count <= MID_SLOTS)).astype(jnp.int32))
    n_huge = jnp.sum((count > max_tiles_per_point).astype(jnp.int32))
    return emitted, n_big, n_mid, n_huge, jnp.max(count)


def probe_workload(pointcloud, pointcloud_features, point_invalid_mask,
                   point_object_id, views: Sequence[Tuple],
                   camera_info: CameraInfo,
                   config) -> Tuple[int, int, int, int, int]:
    """Max (emitted_keys, n_big, n_mid, n_huge, max_count) over `views` =
    [(q (1,4), t (1,3)), ...] probe poses. Uses object id 0's pose for every
    object (probing is approximate by design; headroom absorbs it)."""
    emitted = n_big = n_mid = n_huge = max_count = 0
    cam_hw = (camera_info.camera_height, camera_info.camera_width)
    intr = jnp.asarray(camera_info.camera_intrinsics, jnp.float32)
    for q, t in views:
        e, b, m, hg, mc = _probe_counts(
            pointcloud, pointcloud_features, point_invalid_mask,
            point_object_id, jnp.asarray(q, jnp.float32),
            jnp.asarray(t, jnp.float32), intr, cam_hw,
            float(config.near_plane), float(config.far_plane),
            int(config.max_tiles_per_point))
        emitted = max(emitted, int(e))
        n_big = max(n_big, int(b))
        n_mid = max(n_mid, int(m))
        n_huge = max(n_huge, int(hg))
        max_count = max(max_count, int(mc))
    return emitted, n_big, n_mid, n_huge, max_count


def auto_capacity_config(pointcloud, pointcloud_features, point_invalid_mask,
                         point_object_id, views: Sequence[Tuple],
                         camera_info: CameraInfo, base_config,
                         headroom: float = 1.5):
    """Return `base_config` with `max_keys` / `big_point_divisor` /
    `mid_point_divisor` derived from the probed workload x `headroom`.

    - the big/mid pools are sized to hold `headroom` x the largest probed
      big/mid point population (divisor = N // pool, floored at 1 so the
      pool can only be bigger than requested);
    - `max_keys` covers `headroom` x the largest probed emission, rounded up
      to the chunk multiple the binning slices at, plus the tier slack a
      pooled point carries (a big point owns `max_tiles_per_point` slots even
      when it covers fewer tiles - padding sorts last, but only real keys
      below the `max_keys` cut survive, so the budget covers real keys only).

    When the probe finds splats whose bbox exceeds `max_tiles_per_point`
    tiles (the log-normal size tail of real checkpoints), the huge tier is
    enabled: `max_tiles_per_huge_point` covers the largest probed bbox and
    `huge_pool_size` the probed huge-point population, each with headroom -
    so the derived budgets render the probed views with ZERO dropped tiles.

    Recompile happens naturally when the returned budgets differ from the
    previous ones (the budgets are static jit arguments); the downstream
    overflow guard still counts anything a later frame drops.
    """
    n = int(pointcloud.shape[0])
    emitted, n_big, n_mid, n_huge, max_count = probe_workload(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        views, camera_info, base_config)
    chunk = int(base_config.chunk)

    def pool_divisor(need: int) -> int:
        want = max(int(need * headroom), 1)
        return max(n // want, 1) if want < n else 1

    t_b = int(base_config.max_tiles_per_point)
    if n_huge > 0:
        # cover the probed max bbox with headroom, rounded up to a multiple
        # of 8 (sublane-friendly slot grids); bounded by the tile grid
        t_h = min(int(-(-int(max_count * headroom) // 8)) * 8,
                  camera_info.num_tiles)
        huge_pool = max(int(-(-int(n_huge * headroom) // 8)) * 8, 32)
        huge_pool = min(huge_pool, n)
        if t_h <= t_b:
            t_h, huge_pool = 0, int(base_config.huge_pool_size)
    else:
        t_h, huge_pool = 0, int(base_config.huge_pool_size)

    max_keys = max(int(emitted * headroom), chunk)
    max_keys = ((max_keys + chunk - 1) // chunk) * chunk
    return dataclasses.replace(
        base_config,
        max_keys=max_keys,
        big_point_divisor=pool_divisor(n_big),
        mid_point_divisor=pool_divisor(n_mid),
        max_tiles_per_huge_point=t_h,
        huge_pool_size=huge_pool,
    )
