"""Tile binning under static shapes: bbox -> padded key emission -> sort ->
tile ranges.

This replaces four reference stages with TPU-native equivalents:
- `generate_num_overlap_tiles` (reference: GaussianPointCloudRasterisation.py:106-129)
- `generate_point_sort_key_by_num_overlap_tiles` (reference: :131-173)
- torch CUDA radix sort over packed 64-bit (tile << 32 | depth) keys
  (reference: :947-949)
- `find_tile_start_and_end` (reference: :175-193)

Design differences, chosen for XLA/TPU:
- No dynamic allocation: keys live in a fixed (MAX_KEYS,) buffer. Each point
  emits at most MAX_TILES_PER_POINT slots; overflow in either budget is
  *counted and reported*, never silent.
- No 64-bit packed keys (int64 is emulated on TPU): we use
  `jax.lax.sort` with two 32-bit keys (tile_id, quantized depth), which gives
  the same (tile, depth) lexicographic order. Depth quantization matches the
  reference: int32(depth * depth_to_sort_key_scale), truncation toward zero.
- Tile start/end extraction is a vectorized binary search over the sorted
  tile ids instead of a boundary-detection kernel.

The emission index (point_idx * MAX_TILES_PER_POINT + slot) is carried through
the sort; the backward pass uses it as a *unique-index* scatter permutation to
route per-key gradients back to points without atomics
(design note: SURVEY.md section 2.4 - atomics are replaced by segment
reductions over the sorted key layout).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT


class TileBinning(NamedTuple):
    sorted_tile_id: jnp.ndarray       # (MAX_KEYS,) int32; num_tiles = padding
    sorted_depth_key: jnp.ndarray     # (MAX_KEYS,) int32
    sorted_emission_idx: jnp.ndarray  # (MAX_KEYS,) int32 (point*T_CAP + slot)
    sorted_point_idx: jnp.ndarray     # (MAX_KEYS,) int32 (clamped to [0, N))
    sorted_valid: jnp.ndarray         # (MAX_KEYS,) bool
    tile_starts: jnp.ndarray          # (num_tiles,) int32
    tile_ends: jnp.ndarray            # (num_tiles,) int32
    total_keys: jnp.ndarray           # () int32, keys actually emitted
    key_overflow: jnp.ndarray         # () int32, keys dropped by MAX_KEYS
    tile_cap_overflow: jnp.ndarray    # () int32, tiles dropped by per-point cap


def tile_bbox(uv, radii, camera_info: CameraInfo):
    """Axis-aligned tile bbox exactly as the reference computes it
    (reference: GaussianPointCloudRasterisation.py:81-103), including the
    min-1-pixel radius and the clamp semantics that keep off-screen points in
    the nearest boundary tile."""
    tiles_x = camera_info.camera_width // TILE_WIDTH
    tiles_y = camera_info.camera_height // TILE_HEIGHT
    r = jnp.maximum(radii, 1.0)
    u, v = uv[..., 0], uv[..., 1]
    min_u = jnp.maximum(0.0, u - r)
    max_u = u + r
    min_v = jnp.maximum(0.0, v - r)
    max_v = v + r
    min_tile_u = jnp.minimum(jnp.floor(min_u / TILE_WIDTH).astype(jnp.int32), tiles_x)
    max_tile_u = jnp.floor(max_u / TILE_WIDTH).astype(jnp.int32) + 1
    max_tile_u = jnp.minimum(jnp.maximum(max_tile_u, min_tile_u + 1), tiles_x)
    min_tile_v = jnp.minimum(jnp.floor(min_v / TILE_HEIGHT).astype(jnp.int32), tiles_y)
    max_tile_v = jnp.floor(max_v / TILE_HEIGHT).astype(jnp.int32) + 1
    max_tile_v = jnp.minimum(jnp.maximum(max_tile_v, min_tile_v + 1), tiles_y)
    return min_tile_u, max_tile_u, min_tile_v, max_tile_v


def num_overlap_tiles(uv, radii, in_frustum, camera_info: CameraInfo):
    """(N,) int32 tile-overlap counts, 0 for culled points
    (reference: GaussianPointCloudRasterisation.py:106-129)."""
    min_u, max_u, min_v, max_v = tile_bbox(uv, radii, camera_info)
    count = (max_u - min_u) * (max_v - min_v)
    return jnp.where(in_frustum, count, 0)


def bin_points_to_tiles(
    uv: jnp.ndarray,           # (N, 2)
    depth: jnp.ndarray,        # (N,)
    radii: jnp.ndarray,        # (N,)
    in_frustum: jnp.ndarray,   # (N,) bool
    camera_info: CameraInfo,
    depth_to_sort_key_scale: float = 100.0,
    max_keys: int = 2 ** 21,
    max_tiles_per_point: int = 64,
) -> TileBinning:
    uv = jax.lax.stop_gradient(uv)
    depth = jax.lax.stop_gradient(depth)
    radii = jax.lax.stop_gradient(radii)

    n = uv.shape[0]
    t_cap = max_tiles_per_point
    tiles_x = camera_info.camera_width // TILE_WIDTH
    num_tiles = camera_info.num_tiles

    min_u, max_u, min_v, max_v = tile_bbox(uv, radii, camera_info)
    du = max_u - min_u
    dv = max_v - min_v
    count_full = jnp.where(in_frustum, du * dv, 0)
    count = jnp.minimum(count_full, t_cap)
    tile_cap_overflow = jnp.sum(count_full - count)

    offsets = jnp.cumsum(count) - count  # exclusive prefix sum, (N,)
    total = jnp.sum(count)
    key_overflow = jnp.maximum(total - max_keys, 0)
    total_keys = jnp.minimum(total, max_keys)

    # Slot enumeration matches the reference's emission order: tile_u outer,
    # tile_v inner (reference: :161-172).
    slots = jnp.arange(t_cap, dtype=jnp.int32)[None, :]          # (1, T)
    valid_slot = slots < count[:, None]                          # (N, T)
    slot_du = slots // jnp.maximum(dv[:, None], 1)
    slot_dv = slots % jnp.maximum(dv[:, None], 1)
    tile_id = ((min_v[:, None] + slot_dv) * tiles_x
               + (min_u[:, None] + slot_du)).astype(jnp.int32)    # (N, T)

    depth_key = (depth * depth_to_sort_key_scale).astype(jnp.int32)  # trunc,
    # same quantization as the reference (reference: :158-160)
    depth_key = jnp.broadcast_to(depth_key[:, None], (n, t_cap))

    emission_idx = (jnp.arange(n, dtype=jnp.int32)[:, None] * t_cap
                    + slots)                                      # (N, T)

    target = offsets[:, None] + slots                             # (N, T)
    target = jnp.where(valid_slot & (target < max_keys), target, max_keys)

    # Scatter into the fixed key buffer; indices are unique by construction
    # (disjoint [offset, offset+count) ranges), OOB rows are dropped.
    pad_tile = jnp.full((max_keys,), num_tiles, dtype=jnp.int32)
    pad_depth = jnp.full((max_keys,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    # padding sentinel: out-of-range so the backward's permutation scatter
    # drops padding keys instead of clobbering emission slot 0
    pad_emission = jnp.full((max_keys,), jnp.iinfo(jnp.int32).max,
                            dtype=jnp.int32)
    flat_target = target.reshape(-1)
    buf_tile = pad_tile.at[flat_target].set(
        tile_id.reshape(-1), mode="drop", unique_indices=True)
    buf_depth = pad_depth.at[flat_target].set(
        depth_key.reshape(-1), mode="drop", unique_indices=True)
    buf_emission = pad_emission.at[flat_target].set(
        emission_idx.reshape(-1), mode="drop", unique_indices=True)

    sorted_tile, sorted_depth, sorted_emission = jax.lax.sort(
        (buf_tile, buf_depth, buf_emission), num_keys=2, is_stable=True)

    sorted_valid = sorted_tile < num_tiles
    sorted_point = jnp.where(sorted_valid, sorted_emission // t_cap, 0)

    tile_range_queries = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tile_range_queries,
                                   side="left").astype(jnp.int32)
    tile_ends = jnp.searchsorted(sorted_tile, tile_range_queries,
                                 side="right").astype(jnp.int32)

    return TileBinning(
        sorted_tile_id=sorted_tile,
        sorted_depth_key=sorted_depth,
        sorted_emission_idx=sorted_emission,
        sorted_point_idx=sorted_point,
        sorted_valid=sorted_valid,
        tile_starts=tile_starts,
        tile_ends=tile_ends,
        total_keys=total_keys,
        key_overflow=key_overflow,
        tile_cap_overflow=tile_cap_overflow,
    )
