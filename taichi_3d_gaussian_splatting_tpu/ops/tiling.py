"""Tile binning under static shapes: two-tier padded emission -> one packed
sort -> tile ranges. Completely scatter-free.

This replaces four reference stages with TPU-native equivalents:
- `generate_num_overlap_tiles` (reference: GaussianPointCloudRasterisation.py:106-129)
- `generate_point_sort_key_by_num_overlap_tiles` (reference: :131-173)
- torch CUDA radix sort over packed 64-bit (tile << 32 | depth) keys
  (reference: :947-949)
- `find_tile_start_and_end` (reference: :175-193)

Why this shape (measured on TPU v5e): XLA scatters are catastrophically slow
(~130ms for the compaction this module used to do; ~1.7s for the backward's
27M-row scatter), while `lax.sort` is fast (~6ms for 2M x 3 operands). So
instead of compacting a ragged (N, T_CAP) emission into a dense key buffer
with a scatter and then sorting, we keep FIXED per-point slot budgets and
sort the padded layout directly:

- tier A: every point owns 4 slots - enough for the 2x2-tile bounding boxes
  that cover the vast majority of splats;
- tier B: points overlapping more than 4 tiles (selected with a cheap
  flag-sort over N, no scatter) own `max_tiles_per_point` slots each in a
  fixed pool of `N // big_point_divisor` big-point entries.

Padding slots carry an int32-max key and sort to the end. The (tile, depth)
order is packed into ONE int32 key: tile id in the high bits, quantized depth
in the remaining `31 - ceil_log2(num_tiles)` bits (the reference quantizes to
int32(depth * depth_to_sort_key_scale) in a 64-bit key, reference: :158-160;
we saturate at the narrower budget and document the coarser tie-break).

The sort payload is the slot's *emission position* - a stable flattened
index with contiguous per-point ranges (tier A point i owns [4i, 4i+count);
tier B entry b owns [4N + T_B*b, ... + count)). After the sort, everything
downstream is sliced to a `max_keys` budget: valid keys sort before padding,
so the slice only ever drops real keys when the scene overflows the budget
(counted in key_overflow, never silent). The backward pass exploits the
emission ordering: sorting the kept keys by emission position makes every
point's gradients contiguous, so per-point reduction is one cumulative-sum
difference - no atomics, no scatter (see ops/rasterizer.py).

Overflow is *counted and reported*, never silent: points whose bbox exceeds
`max_tiles_per_point` tiles lose the excess (tile_cap_overflow); big points
beyond the tier-B pool capacity are dropped entirely (big_point_overflow).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT

TIER_A_SLOTS = 4
INT32_MAX = jnp.iinfo(jnp.int32).max


class TileBinning(NamedTuple):
    sorted_key: jnp.ndarray           # (MK,) int32 packed tile|depth
    sorted_tile_id: jnp.ndarray       # (MK,) int32; num_tiles = padding
    sorted_depth_key: jnp.ndarray     # (MK,) int32 quantized depth
    sorted_pos: jnp.ndarray           # (MK,) int32 emission position
    sorted_point_idx: jnp.ndarray     # (MK,) int32 (clamped to [0, N))
    sorted_valid: jnp.ndarray         # (MK,) bool
    tile_starts: jnp.ndarray          # (num_tiles,) int32
    tile_ends: jnp.ndarray            # (num_tiles,) int32
    segment_lengths: jnp.ndarray      # (N + N_BIG,) emitted keys per segment
    point_big_rank: jnp.ndarray       # (N,) int32 tier-B pool rank (or 0)
    point_is_big: jnp.ndarray         # (N,) bool in the tier-B pool
    total_keys: jnp.ndarray           # () int32 valid keys emitted
    key_overflow: jnp.ndarray         # () int32 keys dropped by max_keys
    tile_cap_overflow: jnp.ndarray    # () int32 tiles dropped (cap + pool)
    big_point_overflow: jnp.ndarray   # () int32 points dropped by tier-B pool
    point_data: Optional[jnp.ndarray] = None  # (16, MK) blend slab (only
    #   when attribute columns were passed - see blend_pallas ROW_* layout)


def emission_capacity(n: int, max_tiles_per_point: int = 32,
                      big_point_divisor: int = 8, chunk: int = 128) -> int:
    n_big = max(n // big_point_divisor, 1)
    raw = TIER_A_SLOTS * n + max_tiles_per_point * n_big
    return ((raw + chunk - 1) // chunk) * chunk


def tile_bbox(u, v, radii, camera_info: CameraInfo):
    """Axis-aligned tile bbox exactly as the reference computes it
    (reference: GaussianPointCloudRasterisation.py:81-103), including the
    min-1-pixel radius and the clamp semantics that keep off-screen points in
    the nearest boundary tile."""
    tiles_x = camera_info.camera_width // TILE_WIDTH
    tiles_y = camera_info.camera_height // TILE_HEIGHT
    r = jnp.maximum(radii, 1.0)
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


def num_overlap_tiles(u, v, radii, in_frustum, camera_info: CameraInfo):
    """(N,) int32 exact tile-overlap counts, 0 for culled points
    (reference: GaussianPointCloudRasterisation.py:106-129)."""
    min_u, max_u, min_v, max_v = tile_bbox(u, v, radii, camera_info)
    count = (max_u - min_u) * (max_v - min_v)
    return jnp.where(in_frustum, count, 0)


def _slot_div_mod(slots, dv):
    """(slots // dv, slots % dv) for small positive ints via exact f32 math
    (integer vector division is slow on the VPU)."""
    div = jnp.floor((slots.astype(jnp.float32) + 0.5)
                    / dv.astype(jnp.float32)).astype(jnp.int32)
    return div, slots - div * dv


def _emit_tier(slots, count, min_u, min_v, dv, depth_q, tiles_x, depth_bits):
    """Slot grid -> packed keys, laid out (S, N) so the minor (lane) dim is
    the point dim (a (N, S) layout would put S<128 on the lanes and pad 32x).
    Emission order within a point matches the reference (tile_u outer, tile_v
    inner, reference: :161-172); the *memory* order is slot-major, but every
    consumer keys off the emission-position values, not the layout."""
    valid = slots[:, None] < count[None, :]
    du_idx, dv_idx = _slot_div_mod(slots[:, None], jnp.maximum(dv, 1)[None, :])
    tile = (min_v[None, :] + dv_idx) * tiles_x + (min_u[None, :] + du_idx)
    key = tile * (1 << depth_bits) + depth_q[None, :]
    return jnp.where(valid, key, INT32_MAX), valid


def bin_points_to_tiles(
    u: jnp.ndarray,            # (N,)
    v: jnp.ndarray,            # (N,)
    depth: jnp.ndarray,        # (N,)
    radii: jnp.ndarray,        # (N,)
    in_frustum: jnp.ndarray,   # (N,) bool
    camera_info: CameraInfo,
    depth_to_sort_key_scale: float = 100.0,
    max_tiles_per_point: int = 32,
    big_point_divisor: int = 8,
    max_keys: int = 2 ** 21,
    chunk: int = 128,
    for_backward: bool = True,
    attr_cols: Optional[Sequence[jnp.ndarray]] = None,
) -> TileBinning:
    """for_backward=False (inference) drops everything only the gradient
    routing needs: the emission-position sort operand and the big-point rank
    tables. The corresponding TileBinning fields come back as zeros.

    attr_cols: optional 10 per-point f32 columns (u, v, conic_a, conic_b,
    conic_c, logw, r, g, b, depth). When given, the result carries
    `point_data`, the (16, MK) blend slab, assembled with one packed gather
    by sorted point id."""
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    depth = jax.lax.stop_gradient(depth)
    radii = jax.lax.stop_gradient(radii)

    n = u.shape[0]
    t_b = max_tiles_per_point
    n_big = max(n // big_point_divisor, 1)
    tiles_x = camera_info.camera_width // TILE_WIDTH
    num_tiles = camera_info.num_tiles
    depth_bits = 31 - max(int(math.ceil(math.log2(num_tiles + 1))), 1)
    em_cap = emission_capacity(n, t_b, big_point_divisor, chunk)

    min_u, max_u, min_v, max_v = tile_bbox(u, v, radii, camera_info)
    du = max_u - min_u
    dv = max_v - min_v
    count_full = jnp.where(in_frustum, du * dv, 0)

    depth_q = jnp.clip((depth * depth_to_sort_key_scale).astype(jnp.int32),
                       0, (1 << depth_bits) - 1)

    # ---- tier A: every point, 4 slots (laid out (4, N), see _emit_tier) ----
    is_small = count_full <= TIER_A_SLOTS
    count_a = jnp.where(is_small, count_full, 0)
    slots_a = jnp.arange(TIER_A_SLOTS, dtype=jnp.int32)
    keys_a, valid_a = _emit_tier(slots_a, count_a, min_u, min_v, dv, depth_q,
                                 tiles_x, depth_bits)          # (4, N)

    # ---- tier B: big points into a fixed pool (flag sort, no scatter) ----
    is_big = (count_full > TIER_A_SLOTS)
    flag = jnp.where(is_big, jnp.int32(0), jnp.int32(1))
    _, big_ids = jax.lax.sort(
        (flag, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=False)
    big_ids = big_ids[:n_big]                                  # (N_BIG,)
    n_big_actual = jnp.sum(is_big.astype(jnp.int32))
    big_point_overflow = jnp.maximum(n_big_actual - n_big, 0)
    big_rank = jnp.arange(n_big, dtype=jnp.int32)
    big_active = big_rank < jnp.minimum(n_big_actual, n_big)

    count_b_full = jnp.where(big_active, count_full[big_ids], 0)
    count_b = jnp.minimum(count_b_full, t_b)
    slots_b = jnp.arange(t_b, dtype=jnp.int32)
    keys_b, valid_b = _emit_tier(slots_b, count_b, min_u[big_ids],
                                 min_v[big_ids], dv[big_ids],
                                 depth_q[big_ids], tiles_x, depth_bits)

    # ---- flatten + pad + one packed sort ------------------------------
    # Emission POSITION values stay contiguous per point (tier-A point i owns
    # [4i, 4i+count), tier-B entry b owns [4N + t_b*b, ...)) even though the
    # memory layout is slot-major; the backward's segmented reduction keys off
    # these values. Padding slots get a sentinel position so the
    # sort-by-position compaction puts them after every real segment.
    pt_a = jax.lax.broadcasted_iota(jnp.int32, (TIER_A_SLOTS, n), 1)
    pad_len = em_cap - TIER_A_SLOTS * n - t_b * n_big

    def _flatten(tier_a, tier_b, pad_value, dtype):
        return jnp.concatenate([
            tier_a.reshape(-1).astype(dtype), tier_b.reshape(-1).astype(dtype),
            jnp.full((pad_len,), pad_value, dtype)])

    flat_keys = _flatten(keys_a, keys_b, INT32_MAX, jnp.int32)
    # the point id rides through the sort as a payload: deriving it from the
    # emission position afterwards would need an (EM_CAP,) gather from the
    # big-point table, which is slow on TPU
    flat_ids = _flatten(jnp.broadcast_to(pt_a, (TIER_A_SLOTS, n)),
                        jnp.broadcast_to(big_ids[None, :], (t_b, n_big)),
                        0, jnp.int32)
    operands = [flat_keys, flat_ids]
    if for_backward:
        pos_a = pt_a * TIER_A_SLOTS + slots_a[:, None]
        pos_b = (TIER_A_SLOTS * n + big_rank[None, :] * t_b
                 + slots_b[:, None])
        operands.append(_flatten(jnp.where(valid_a, pos_a, INT32_MAX),
                                 jnp.where(valid_b, pos_b, INT32_MAX),
                                 INT32_MAX, jnp.int32))
    # UNSTABLE sort: XLA implements a stable TPU sort by adding a hidden
    # iota tiebreaker operand (visible in the optimized HLO comparator),
    # which costs like a full extra payload (~1.7 ms at 2.6M rows). Ties in
    # the packed key (same tile, same quantized depth) have no defined blend
    # order in the reference either (torch.sort is also unstable).
    sorted_all = jax.lax.sort(tuple(operands), num_keys=1, is_stable=False)

    # slice everything downstream to the max_keys budget (valid keys sort
    # first; the slice drops real keys only on overflow, which is counted)
    mk = min(((max_keys + chunk - 1) // chunk) * chunk, em_cap)
    sorted_key = sorted_all[0][:mk]
    sorted_ids = sorted_all[1][:mk]
    sorted_pos = (sorted_all[2][:mk] if for_backward
                  else jnp.zeros((mk,), jnp.int32))
    sorted_valid = sorted_key != INT32_MAX
    sorted_point_idx = jnp.where(sorted_valid, sorted_ids, 0)
    point_data = None
    if attr_cols is not None:
        # blend slab in ROW_* layout (see blend_pallas): ONE (16, MK) packed
        # gather of the per-point columns by sorted point id (~6 ns/index on
        # v5e, independent of the row count up to the 16-sublane tile).
        # Carrying the columns through the sort as payload operands instead
        # was measured far slower: the sort costs ~1.7 ms/operand at 2.6M
        # rows, so 10 payloads cost ~17 ms vs ~4 ms for this gather. (Beware
        # when re-measuring: XLA deletes unused sort operands, so a probe
        # must consume every output or it measures a smaller sort.)
        u, v, ca, cb, cc, logw, cr, cg, cb_col, depth = (
            jax.lax.stop_gradient(c.astype(jnp.float32)) for c in attr_cols)
        zeros = jnp.zeros_like(logw)
        rows = jnp.stack([
            u, v, ca, cb, cc, logw,
            zeros, zeros,
            cr, cg, cb_col, depth, jnp.ones_like(logw),
            zeros, zeros, zeros,
        ], axis=0)                                   # (16, N)
        point_data = rows[:, sorted_point_idx]       # (16, MK)

    if for_backward:
        # per-point emission range (for the backward's segmented reduction)
        point_arange = jnp.arange(n, dtype=jnp.int32)
        # tier B start per point: need rank of each big point;
        # big_ids[rank] = id. Build id -> rank with a second flag sort
        # payload trick: sort (big_ids padded with sentinel) would need a
        # scatter; instead carry the rank via sorting (big_ids, rank) by id.
        big_sorted_ids, big_sorted_rank = jax.lax.sort(
            (jnp.where(big_active, big_ids, INT32_MAX), big_rank),
            num_keys=1, is_stable=False)
        # searchsorted gives each point its rank slot (valid only for big
        # points)
        found = jnp.searchsorted(big_sorted_ids, point_arange,
                                 method="sort").astype(jnp.int32)
        found = jnp.clip(found, 0, n_big - 1)
        rank_of_point = big_sorted_rank[found]
        is_pooled_big = (big_sorted_ids[found] == point_arange) & is_big
        point_big_rank = jnp.where(is_pooled_big, rank_of_point, 0)
    else:
        is_pooled_big = jnp.zeros((n,), bool)
        point_big_rank = jnp.zeros((n,), jnp.int32)
    # per-segment emitted key counts in emission order: N tier-A segments
    # (count_a) followed by N_BIG tier-B segments (count_b)
    segment_lengths = jnp.concatenate([count_a, count_b])

    # one unrolled binary search for all tile boundaries: starts[t] and
    # ends[t] = starts[t+1] come from a single (num_tiles+1)-query search.
    # method="scan_unrolled" matters: the default while-loop lowering costs
    # ~1 ms per iteration in launch overhead (profiled)
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits
    edges = jnp.searchsorted(sorted_key, boundaries, side="left",
                             method="scan_unrolled").astype(jnp.int32)
    tile_starts = edges[:-1]
    tile_ends = edges[1:]

    total_emitted = jnp.sum(count_a) + jnp.sum(count_b)
    key_overflow = jnp.maximum(total_emitted - mk, 0)
    sorted_tile_id = jnp.where(sorted_valid, sorted_key >> depth_bits,
                               num_tiles)
    sorted_depth_key = jnp.where(
        sorted_valid, sorted_key & ((1 << depth_bits) - 1), INT32_MAX)
    return TileBinning(
        sorted_key=sorted_key,
        sorted_tile_id=sorted_tile_id,
        sorted_depth_key=sorted_depth_key,
        sorted_pos=sorted_pos,
        sorted_point_idx=sorted_point_idx,
        sorted_valid=sorted_valid,
        tile_starts=tile_starts,
        tile_ends=tile_ends,
        segment_lengths=segment_lengths,
        point_big_rank=point_big_rank,
        point_is_big=is_pooled_big,
        total_keys=total_emitted,
        key_overflow=key_overflow,
        tile_cap_overflow=jnp.sum(count_full) - total_emitted,
        big_point_overflow=big_point_overflow,
        point_data=point_data,
    )
