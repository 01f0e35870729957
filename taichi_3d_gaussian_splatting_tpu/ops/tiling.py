"""Tile binning under static shapes: three-tier padded emission -> one packed
sort -> tile ranges. Completely scatter-free.

This replaces four reference stages with TPU-native equivalents:
- `generate_num_overlap_tiles` (reference: GaussianPointCloudRasterisation.py:106-129)
- `generate_point_sort_key_by_num_overlap_tiles` (reference: :131-173)
- torch CUDA radix sort over packed 64-bit (tile << 32 | depth) keys
  (reference: :947-949)
- `find_tile_start_and_end` (reference: :175-193)

Why this shape (measured on TPU v5e): XLA scatters are catastrophically slow
(~130ms for the compaction this module used to do; ~1.7s for the backward's
27M-row scatter), while `lax.sort` is fast and costs ~0.7 ms per operand per
million rows. So instead of compacting a ragged emission into a dense key
buffer with a scatter and then sorting, we keep FIXED per-point slot budgets
and sort the padded layout directly. The sort is the single most expensive
binning stage and its cost is linear in rows x operands, so the tiers are
sized from measured overlap statistics (Truck-scale scene at 976x544:
70% of visible splats cover <= 2 tiles, 97% cover <= 4, ~2% cover > 4):

- tier A: every point owns TIER_A_SLOTS=2 slots - enough for the 1x2/2x1
  tile bounding boxes that cover the majority of splats - read directly
  from the per-point columns (gather-free);
- a POOL LADDER for everything bigger: a static list of (slot_size,
  capacity) tiers, each holding the points whose bbox fits its slot count
  but not the next-smaller tier's. With geometric slot sizes (4, 8, 16,
  ... sized from a one-frame workload probe, see ops/capacity.py
  `auto_capacity_config`) padded-slot waste is bounded below 2x at ANY
  scale - real checkpoints have a log-normal size tail where a few
  thousand splats cover 50-600 tiles each, and a single fixed "big"
  budget either truncates them (tile_cap_overflow) or multiplies the
  sort rows by max_count/typical_count. Legacy 2/3-tier knobs
  (`mid_point_divisor`, `big_point_divisor` / `max_tiles_per_point`,
  optional huge tier) are still accepted and resolve to a ladder.

All pools are selected by ONE category sort over N (key: tier index,
largest slots first, K=rest; payload: point id). Each tier's ids are a
dynamic-start slice beginning at the (traced) preceding-category totals.
No scatter anywhere.

Padding slots carry an int32-max key and sort to the end. The (tile, depth)
order is packed into ONE int32 key: tile id in the high bits, quantized depth
in the remaining `31 - ceil_log2(num_tiles)` bits (the reference quantizes to
int32(depth * depth_to_sort_key_scale) in a 64-bit key, reference: :158-160;
we saturate at the narrower budget and document the coarser tie-break).
A 64-bit packed single-operand sort was measured and rejected: int64
compares are emulated on v5e and cost the same as two int32 operands.

The sort payload is the owning point id. After the sort, everything
downstream is sliced to a `max_keys` budget: valid keys sort before padding,
so the slice only ever drops real keys when the scene overflows the budget
(counted in key_overflow, never silent). The backward pass re-sorts the kept
keys BY POINT ID, which makes every point's gradients contiguous, so the
per-point reduction is one segmented shift-add scan whose segment ends are a
plain cumulative sum of `point_kept_keys` (exact searchsorted fallback when
any pool or key budget overflowed) - no atomics, no scatter (see
ops/rasterizer.py).

Overflow is *counted and reported*, never silent: points whose bbox exceeds
`max_tiles_per_point` tiles lose the excess (tile_cap_overflow); mid/big
points beyond their pool capacity are dropped entirely (big_point_overflow).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT

TIER_A_SLOTS = 2
MID_SLOTS = 4
INT32_MAX = jnp.iinfo(jnp.int32).max


class TileBinning(NamedTuple):
    sorted_key: jnp.ndarray           # (MK,) int32 packed tile|depth
    sorted_tile_id: jnp.ndarray       # (MK,) int32; num_tiles = padding
    sorted_depth_key: jnp.ndarray     # (MK,) int32 quantized depth
    sorted_point_idx: jnp.ndarray     # (MK,) int32 (clamped to [0, N))
    sorted_valid: jnp.ndarray         # (MK,) bool
    tile_starts: jnp.ndarray          # (num_tiles,) int32
    tile_ends: jnp.ndarray            # (num_tiles,) int32
    point_kept_keys: jnp.ndarray      # (N,) int32 keys kept per point,
    #   exact when big_point_overflow == 0 and key_overflow == 0 (the
    #   gradient routing falls back to a searchsorted otherwise)
    total_keys: jnp.ndarray           # () int32 valid keys emitted
    key_overflow: jnp.ndarray         # () int32 keys dropped by max_keys
    tile_cap_overflow: jnp.ndarray    # () int32 tiles dropped (cap + pool)
    big_point_overflow: jnp.ndarray   # () int32 points dropped by pool caps
    point_data: Optional[jnp.ndarray] = None  # blend slab (only when
    #   attribute columns were passed): (16, MK) f32 wide16 (blend_pallas
    #   ROW_* layout) or (8, MK) int32 packed8 (_packed8_slab)


def pool_capacities(n: int, mid_point_divisor: int = 4,
                    big_point_divisor: int = 16):
    return (max(n // mid_point_divisor, 1), max(n // big_point_divisor, 1))


def resolve_pools(n: int, num_tiles: int,
                  max_tiles_per_point: int = 32,
                  big_point_divisor: int = 16,
                  mid_point_divisor: int = 4,
                  max_tiles_per_huge_point: int = 0,
                  huge_pool_size: int = 256,
                  pool_slots: Sequence[int] = (),
                  pool_caps: Sequence[int] = ()):
    """The pool ladder as [(slot_size, capacity), ...] ascending by slots.

    When `pool_slots`/`pool_caps` are given (auto-sized from a workload
    probe, see ops/capacity.py) they ARE the ladder - any number of tiers
    with arbitrary slot sizes, which bounds padded-slot waste to < 2x when
    the slots are geometric. Otherwise the legacy 2/3-tier layout is
    derived from the divisor knobs (mid 3..4 tiles, big 5..max_tiles_per
    _point, optional huge)."""
    if pool_slots:
        if len(pool_slots) != len(pool_caps):
            raise ValueError("pool_slots and pool_caps must pair up")
        if list(pool_slots) != sorted(set(int(s) for s in pool_slots)) or \
                int(pool_slots[0]) <= TIER_A_SLOTS:
            raise ValueError(
                f"pool_slots must be strictly ascending and > "
                f"{TIER_A_SLOTS}; got {tuple(pool_slots)}")
        pools = []
        for s, c in zip(pool_slots, pool_caps):
            # a bbox can never exceed the whole grid; tiers collapsed by
            # the clamp merge into one (their caps add), so an explicit
            # ladder stays valid across image resolutions
            s = min(int(s), num_tiles)
            c = max(min(int(c), n), 1)
            if pools and s <= pools[-1][0]:
                pools[-1] = (pools[-1][0], min(pools[-1][1] + c, n))
            else:
                pools.append((s, c))
        return pools
    t_b = int(max_tiles_per_point)
    if t_b < MID_SLOTS:
        # a point covering MID_SLOTS tiles would emit more keys than
        # point_kept_keys reports and than the backward's segmented scan
        # covers - silent gradient corruption, so refuse loudly
        raise ValueError(
            f"max_tiles_per_point={t_b} must be >= {MID_SLOTS} (MID_SLOTS)")
    if max_tiles_per_huge_point and max_tiles_per_huge_point <= t_b:
        raise ValueError(
            f"max_tiles_per_huge_point={max_tiles_per_huge_point} must "
            f"exceed max_tiles_per_point={t_b} (or be 0 to disable)")
    n_mid_cap, n_big_cap = pool_capacities(n, mid_point_divisor,
                                           big_point_divisor)
    pools = [(MID_SLOTS, n_mid_cap)]
    if t_b > MID_SLOTS:
        pools.append((min(t_b, num_tiles), n_big_cap))
    # a bbox can never exceed the whole grid; if the clamp leaves no room
    # above t_b the tier is dead weight, so drop it
    t_h = min(int(max_tiles_per_huge_point), num_tiles)
    if t_h > pools[-1][0]:
        pools.append((t_h, max(min(int(huge_pool_size), n), 1)))
    return pools


def emission_capacity_pools(n: int, pools, chunk: int = 128,
                            tier_a_cap: int = 0) -> int:
    a_rows = min(int(tier_a_cap), n) if tier_a_cap else n
    raw = TIER_A_SLOTS * a_rows + sum(s * c for s, c in pools)
    return ((raw + chunk - 1) // chunk) * chunk


def emission_capacity(n: int, max_tiles_per_point: int = 32,
                      big_point_divisor: int = 16, chunk: int = 128,
                      mid_point_divisor: int = 4,
                      max_tiles_per_huge_point: int = 0,
                      huge_pool_size: int = 0) -> int:
    """Legacy-knob emission capacity (num_tiles unconstrained)."""
    pools = resolve_pools(n, 1 << 30, max_tiles_per_point, big_point_divisor,
                          mid_point_divisor, max_tiles_per_huge_point,
                          huge_pool_size)
    return emission_capacity_pools(n, pools, chunk)


def tile_bbox(u, v, radius_x, radius_y, camera_info: CameraInfo):
    """Axis-aligned tile bbox with the reference's min-1-pixel radius and
    clamp semantics (off-screen points stay in the nearest boundary tile,
    reference: GaussianPointCloudRasterisation.py:81-103). Unlike the
    reference's circular radius, the two axes take independent extents (the
    per-axis 3-sigma marginals from projection) - a strictly tighter box at
    identical <= 3-sigma coverage (see ops/projection.py radius_x)."""
    tiles_x = camera_info.camera_width // TILE_WIDTH
    tiles_y = camera_info.camera_height // TILE_HEIGHT
    rx = jnp.maximum(radius_x, 1.0)
    ry = jnp.maximum(radius_y, 1.0)
    min_u = jnp.maximum(0.0, u - rx)
    max_u = u + rx
    min_v = jnp.maximum(0.0, v - ry)
    max_v = v + ry
    min_tile_u = jnp.minimum(jnp.floor(min_u / TILE_WIDTH).astype(jnp.int32), tiles_x)
    max_tile_u = jnp.floor(max_u / TILE_WIDTH).astype(jnp.int32) + 1
    max_tile_u = jnp.minimum(jnp.maximum(max_tile_u, min_tile_u + 1), tiles_x)
    min_tile_v = jnp.minimum(jnp.floor(min_v / TILE_HEIGHT).astype(jnp.int32), tiles_y)
    max_tile_v = jnp.floor(max_v / TILE_HEIGHT).astype(jnp.int32) + 1
    max_tile_v = jnp.minimum(jnp.maximum(max_tile_v, min_tile_v + 1), tiles_y)
    return min_tile_u, max_tile_u, min_tile_v, max_tile_v


def num_overlap_tiles(u, v, radius_x, radius_y, in_frustum,
                      camera_info: CameraInfo):
    """(N,) int32 exact tile-overlap counts, 0 for culled points
    (reference: GaussianPointCloudRasterisation.py:106-129)."""
    min_u, max_u, min_v, max_v = tile_bbox(u, v, radius_x, radius_y,
                                           camera_info)
    count = (max_u - min_u) * (max_v - min_v)
    return jnp.where(in_frustum, count, 0)


def _slot_div_mod(slots, dv):
    """(slots // dv, slots % dv) for small positive ints via exact f32 math
    (integer vector division is slow on the VPU)."""
    div = jnp.floor((slots.astype(jnp.float32) + 0.5)
                    / dv.astype(jnp.float32)).astype(jnp.int32)
    return div, slots - div * dv


def _emit_tier(slots, count, min_u, min_v, dv, depth_q, tiles_x, depth_bits):
    """Slot grid -> packed keys (padding slots carry INT32_MAX), laid out
    (S, N) so the minor (lane) dim is
    the point dim (a (N, S) layout would put S<128 on the lanes and pad 32x).
    Emission order within a point matches the reference (tile_u outer, tile_v
    inner, reference: :161-172); the *memory* order is slot-major, but every
    consumer keys off the emission-position values, not the layout."""
    valid = slots[:, None] < count[None, :]
    du_idx, dv_idx = _slot_div_mod(slots[:, None], jnp.maximum(dv, 1)[None, :])
    tile = (min_v[None, :] + dv_idx) * tiles_x + (min_u[None, :] + du_idx)
    key = tile * (1 << depth_bits) + depth_q[None, :]
    return jnp.where(valid, key, INT32_MAX)


def _bf16_hi(x):
    """Round-to-nearest bf16 of f32 `x`, as the HIGH 16 bits of an int32
    (bf16 bits are exactly the top half of the f32 pattern)."""
    b = x.astype(jnp.bfloat16).astype(jnp.float32)
    return jax.lax.bitcast_convert_type(b, jnp.int32) & jnp.int32(-1 << 16)


def pack_bf16_pair(hi, lo):
    """One int32 word carrying two round-to-nearest bf16 values."""
    return _bf16_hi(hi) | jax.lax.shift_right_logical(_bf16_hi(lo), 16)


def _packed8_slab(cols, sorted_point_idx):
    """(8, MK) int32 blend slab: rows [u, v, ca, cb, cc, logw] are f32
    bitcasts (exact), row 6 = bf16(r)|bf16(g), row 7 = bf16(b)|bf16(depth).
    Gathered as contiguous 32-byte (1, 8) rows from an (N, 8) table - half
    the table bytes of wide16, which matters because the gather's per-index
    cost cliffs with table size (see bin_points_to_tiles docstring)."""
    u, v, ca, cb, cc, logw, cr, cg, cb_col, depth = cols
    rows = jnp.stack(
        [jax.lax.bitcast_convert_type(c, jnp.int32)
         for c in (u, v, ca, cb, cc, logw)]
        + [pack_bf16_pair(cr, cg), pack_bf16_pair(cb_col, depth)],
        axis=0)                                      # (8, N) int32
    # barrier: keep XLA from recomputing the pack per gathered element
    # (same hazard as the wide16 path below)
    rows = jax.lax.optimization_barrier(rows)
    rows_t = rows.T                                  # (N, 8)
    return jax.lax.gather(
        rows_t, sorted_point_idx[None, :, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, 8),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(8, -1)                                 # (8, MK)


def bin_points_to_tiles(
    u: jnp.ndarray,            # (N,)
    v: jnp.ndarray,            # (N,)
    depth: jnp.ndarray,        # (N,)
    radius_x: jnp.ndarray,     # (N,) per-axis bbox half-extents (pixels)
    radius_y: jnp.ndarray,     # (N,)
    in_frustum: jnp.ndarray,   # (N,) bool
    camera_info: CameraInfo,
    depth_to_sort_key_scale: float = 100.0,
    max_tiles_per_point: int = 32,
    big_point_divisor: int = 16,
    max_keys: int = 2 ** 21,
    chunk: int = 128,
    attr_cols: Optional[Sequence[jnp.ndarray]] = None,
    mid_point_divisor: int = 4,
    max_tiles_per_huge_point: int = 0,
    huge_pool_size: int = 256,
    pool_slots: Sequence[int] = (),
    pool_caps: Sequence[int] = (),
    slab_gather: str = "row",
    tier_a_cap: int = 0,
    pool_meta: str = "auto",
    slab_format: str = "wide16",
) -> TileBinning:
    """attr_cols: optional 10 per-point f32 columns (u, v, conic_a, conic_b,
    conic_c, logw, r, g, b, depth). When given, the result carries
    `point_data`, the blend slab, assembled with one packed gather by sorted
    point id. slab_format picks its layout:

    - "wide16": (16, MK) f32 rows (ROW_* layout, see blend_pallas) - the
      exact path, every attribute at full f32.
    - "packed8": (8, MK) int32 rows [u, v, ca, cb, cc, logw (f32 bitcast),
      rg, bd (two round-to-nearest bf16 halves per word)]. HALVES the
      gathered table to 32 bytes/point: the gather is issue-rate bound with
      a table-SIZE cliff (measured v5e: ~6.6 ns/idx at a 66 MB table,
      ~13-22 ns at 133 MB - scratch/perf_gather_ab.py + the round-5 xprof
      attribution), so at megapoint scale the (N, 16) f32 table is the
      single most expensive object in the frame. Colors and depth carry
      bf16 rounding (relative error 2^-9 ~ 0.2%, below the 1/255 output
      quantization); u/v/conic/logw stay exact f32, so splat SHAPES and
      alphas are bit-identical and only the blended color values move.
      Inference-only (rgb_only path)."""
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    depth = jax.lax.stop_gradient(depth)
    radius_x = jax.lax.stop_gradient(radius_x)
    radius_y = jax.lax.stop_gradient(radius_y)

    n = u.shape[0]
    num_tiles = camera_info.num_tiles
    pools = resolve_pools(n, num_tiles, max_tiles_per_point,
                          big_point_divisor, mid_point_divisor,
                          max_tiles_per_huge_point, huge_pool_size,
                          pool_slots, pool_caps)
    s_max = pools[-1][0]
    tiles_x = camera_info.camera_width // TILE_WIDTH
    depth_bits = 31 - max(int(math.ceil(math.log2(num_tiles + 1))), 1)
    # tier-A compaction: with a probed tier_a_cap, tier A becomes one more
    # pool tier selected by the category sort instead of a dense (2, N)
    # grid - culled/invisible points then contribute ZERO rows to the main
    # key sort (measured 430k bench: 36% of its pool is out-of-frustum per
    # view, i.e. ~28% of sorted rows were pure padding). tier_a_cap == 0
    # keeps the legacy all-N layout (no probe needed).
    compact_a = bool(tier_a_cap) and int(tier_a_cap) < n
    a_cap = min(int(tier_a_cap), n) if compact_a else n
    em_cap = emission_capacity_pools(n, pools, chunk,
                                     a_cap if compact_a else 0)

    min_u, max_u, min_v, max_v = tile_bbox(u, v, radius_x, radius_y,
                                           camera_info)
    du = max_u - min_u
    dv = max_v - min_v
    count_full = jnp.where(in_frustum, du * dv, 0)

    depth_q = jnp.clip((depth * depth_to_sort_key_scale).astype(jnp.int32),
                       0, (1 << depth_bits) - 1)

    if not compact_a:
        # ---- legacy tier A: every point, 2 slots, laid out (2, N) ----
        is_small = count_full <= TIER_A_SLOTS
        count_a = jnp.where(is_small, count_full, 0)
        slots_a = jnp.arange(TIER_A_SLOTS, dtype=jnp.int32)
        keys_a = _emit_tier(slots_a, count_a, min_u, min_v, dv, depth_q,
                            tiles_x, depth_bits)               # (2, N)

    # ---- pools: ONE category sort selects every tier (no scatter) ---------
    # Tiers are ordered DESCENDING by slot size for the sort: category 0 =
    # largest slots, ..., K-1 = smallest tier (compacted tier A when
    # enabled), K = everything else (culled, plus legacy tier A). After the
    # unstable sort each tier's ids start at the traced preceding-category
    # total, extracted with dynamic-start slices.
    desc = list(reversed(pools))            # [(slots, cap)] descending
    if compact_a:
        desc.append((TIER_A_SLOTS, a_cap))
    K = len(desc)
    cat = jnp.full((n,), K, jnp.int32)
    lower = 0 if compact_a else TIER_A_SLOTS
    for i in range(K - 1, -1, -1):          # smallest tier first
        cat = jnp.where(count_full > lower, jnp.int32(i), cat)
        lower = desc[i][0]
    # count_full > s_max also lands in category 0 (truncated to s_max slots:
    # the excess tiles are counted in tile_cap_overflow)

    # per-entry emission metadata (min_u, min_v, dv, depth_q, count): either
    # PACKED into two extra int32 payload operands riding the category sort
    # (costs ~0.7 ns/point/operand, no gather) or the legacy 5-column
    # packed-table gather by pool id (~5 ns/index - 5.8 ms/frame at 2.08M
    # where tier-A compaction put ~1.2M entries through it, xprof trace).
    # The payloads make tier-A compaction affordable: removing the dense
    # 2N tier-A rows from the main key sort no longer buys a gather.
    tiles_y = camera_info.camera_height // TILE_HEIGHT
    bu = max(int(tiles_x).bit_length(), 1)        # min_u in [0, tiles_x]
    bv = max(int(tiles_y).bit_length(), 1)        # min_v in [0, tiles_y]
    bdv = bv                                      # dv in [0, tiles_y]
    bcnt = max(int(num_tiles).bit_length(), 1)    # count in [0, num_tiles]
    packed_ok = bu + bv + bdv + bcnt <= 31
    if pool_meta not in ("auto", "packed", "gather"):
        raise ValueError(f"pool_meta must be auto|packed|gather, "
                         f"got {pool_meta!r}")
    if pool_meta == "packed" and not packed_ok:
        raise ValueError(
            f"pool_meta='packed' needs {bu}+{bv}+{bdv}+{bcnt} <= 31 bits "
            f"(tile grid {tiles_x}x{tiles_y})")
    use_packed = packed_ok if pool_meta == "auto" else pool_meta == "packed"

    iota = jnp.arange(n, dtype=jnp.int32)
    if use_packed:
        p0 = (min_u + (min_v << bu) + (dv << (bu + bv))
              + (count_full << (bu + bv + bdv)))
        _, sorted_ids_by_cat, p0_s, dq_s = jax.lax.sort(
            (cat, iota, p0, depth_q), num_keys=1, is_stable=False)
    else:
        _, sorted_ids_by_cat = jax.lax.sort(
            (cat, iota), num_keys=1, is_stable=False)

    pool_id_parts = []
    meta_parts = []
    active_parts = []
    prefix = jnp.int32(0)
    big_point_overflow = jnp.int32(0)
    for i, (s_i, cap_i) in enumerate(desc):
        n_i = jnp.sum((cat == i).astype(jnp.int32))
        # clamp the slice start so the entry -> sorted-position map stays
        # explicit even when the preceding counts + the pool exceed N
        start_i = jnp.minimum(prefix, jnp.int32(max(n - cap_i, 0)))
        ids_i = jax.lax.dynamic_slice(sorted_ids_by_cat, (start_i,),
                                      (cap_i,))
        if use_packed:
            p0_i = jax.lax.dynamic_slice(p0_s, (start_i,), (cap_i,))
            dq_i = jax.lax.dynamic_slice(dq_s, (start_i,), (cap_i,))
            meta_parts.append((
                p0_i & ((1 << bu) - 1),                    # min_u
                (p0_i >> bu) & ((1 << bv) - 1),            # min_v
                (p0_i >> (bu + bv)) & ((1 << bdv) - 1),    # dv
                dq_i,                                      # depth_q
                p0_i >> (bu + bv + bdv),                   # count
            ))
        pos_i = start_i + jnp.arange(cap_i, dtype=jnp.int32)
        active_i = (pos_i >= prefix) & (pos_i < prefix + n_i)
        big_point_overflow = big_point_overflow + (
            n_i - jnp.sum(active_i.astype(jnp.int32)))
        pool_id_parts.append(ids_i)
        active_parts.append(active_i)
        prefix = prefix + n_i

    if not use_packed:
        # legacy: one packed-table gather (5 int32 columns x sum(pool
        # capacities) indices)
        pool_ids = jnp.concatenate(pool_id_parts)
        pool_tbl = jnp.stack([min_u, min_v, dv, depth_q, count_full],
                             axis=0)[:, pool_ids]
    tier_keys = []
    tier_emitted = []
    off = 0
    for i, (s_i, cap_i) in enumerate(desc):
        if use_packed:
            src = meta_parts[i]
        else:
            sl = slice(off, off + cap_i)
            src = tuple(pool_tbl[j, sl] for j in range(5))
        off += cap_i
        cnt = jnp.where(active_parts[i], jnp.minimum(src[4], s_i), 0)
        tier_emitted.append(jnp.sum(cnt))
        slots_i = jnp.arange(s_i, dtype=jnp.int32)
        tier_keys.append(_emit_tier(slots_i, cnt, src[0], src[1], src[2],
                                    src[3], tiles_x, depth_bits))

    # ---- flatten + pad + one packed sort ------------------------------
    # Legacy tier-A emission reads the (N,) columns directly (gather-free);
    # every pool tier's keys come from the shared gathered table. Padding
    # slots carry INT32_MAX keys and sort to the end.
    pad_len = (em_cap - (0 if compact_a else TIER_A_SLOTS * n)
               - sum(s * c for s, c in desc))

    def _flatten(tier_a, tiers, pad_value, dtype):
        head = [] if tier_a is None else [tier_a.reshape(-1).astype(dtype)]
        return jnp.concatenate(
            head + [t.reshape(-1).astype(dtype) for t in tiers]
            + [jnp.full((pad_len,), pad_value, dtype)])

    flat_keys = _flatten(None if compact_a else keys_a, tier_keys,
                         INT32_MAX, jnp.int32)
    # the point id rides through the sort as a payload: deriving it from the
    # emission position afterwards would need an (EM_CAP,) gather from the
    # pool tables, which is slow on TPU
    pt_a = (None if compact_a else
            jax.lax.broadcasted_iota(jnp.int32, (TIER_A_SLOTS, n), 1))
    flat_ids = _flatten(
        pt_a,
        [jnp.broadcast_to(ids_i[None, :], (s_i, cap_i))
         for (s_i, cap_i), ids_i in zip(desc, pool_id_parts)],
        0, jnp.int32)
    operands = [flat_keys, flat_ids]
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
    sorted_valid = sorted_key != INT32_MAX
    sorted_point_idx = jnp.where(sorted_valid, sorted_ids, 0)
    point_data = None
    if attr_cols is not None and slab_format == "packed8":
        u, v, ca, cb, cc, logw, cr, cg, cb_col, depth = (
            jax.lax.stop_gradient(c.astype(jnp.float32)) for c in attr_cols)
        point_data = _packed8_slab(
            (u, v, ca, cb, cc, logw, cr, cg, cb_col, depth),
            sorted_point_idx)
    elif attr_cols is not None and slab_format != "wide16":
        raise ValueError(f"slab_format must be wide16|packed8, "
                         f"got {slab_format!r}")
    elif attr_cols is not None:
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
        # barrier: without it XLA fuses the projection math INTO the gather
        # and recomputes attributes per gathered element (measured 4.7 ms vs
        # 0.1 ms for the packed-table gather alone at 715k keys)
        rows = jax.lax.optimization_barrier(rows)
        if slab_gather == "rowb":
            # like "row", but the barrier sits AFTER the transpose so the
            # (N, 16) table is a materialized row-major array the gather
            # reads contiguously. With the barrier before the transpose
            # (mode "row"), XLA fuses the transpose INTO the gather and each
            # "contiguous row" fetch degrades back to 16 strided words
            # across a 4*N-byte pitch (suspected cause of the production
            # 12.5 ns/idx vs the standalone probe's 6.6 ns/idx at a 2.08M
            # table; scratch/perf_gather_ab.py).
            rows_t = jax.lax.optimization_barrier(rows.T)   # (N, 16)
            point_data = jax.lax.gather(
                rows_t, sorted_point_idx[None, :, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(0,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, 16),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(16, -1)             # (16, MK)
        elif slab_gather == "row":
            # ROW-major table gather with the transpose fused into the
            # gather op: one index pulls a 64-byte CONTIGUOUS (1, 16) row
            # instead of 16 strided 4-byte words across a 4*N-byte pitch
            # (the column gather costs 6.6 ns/index - 4.06 ms at 430k and
            # the dominant stage at megapoint scale; see benchmark/README
            # round-5 attribution). out[j, 0, b] = rows_t[idx[b], j].
            rows_t = rows.T                          # (N, 16)
            point_data = jax.lax.gather(
                rows_t, sorted_point_idx[None, :, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(0,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, 16),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(16, -1)             # (16, MK)
        else:
            point_data = rows[:, sorted_point_idx]   # (16, MK)

    # per-point kept-key counts for the gradient routing's segment ends;
    # exact as long as no pool entry and no key was dropped (the routing
    # checks the overflow counters and falls back to a searchsorted).
    # Every point's tier has slots >= its count by construction except the
    # largest tier, which truncates at s_max.
    point_kept_keys = jnp.minimum(count_full, s_max)

    # one unrolled binary search for all tile boundaries: starts[t] and
    # ends[t] = starts[t+1] come from a single (num_tiles+1)-query search.
    # method="scan_unrolled" matters: the default while-loop lowering costs
    # ~1 ms per iteration in launch overhead (profiled)
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits
    edges = jnp.searchsorted(sorted_key, boundaries, side="left",
                             method="scan_unrolled").astype(jnp.int32)
    tile_starts = edges[:-1]
    tile_ends = edges[1:]

    total_emitted = (jnp.int32(0) if compact_a else jnp.sum(count_a))
    for e in tier_emitted:
        total_emitted = total_emitted + e
    key_overflow = jnp.maximum(total_emitted - mk, 0)
    sorted_tile_id = jnp.where(sorted_valid, sorted_key >> depth_bits,
                               num_tiles)
    sorted_depth_key = jnp.where(
        sorted_valid, sorted_key & ((1 << depth_bits) - 1), INT32_MAX)
    return TileBinning(
        sorted_key=sorted_key,
        sorted_tile_id=sorted_tile_id,
        sorted_depth_key=sorted_depth_key,
        sorted_point_idx=sorted_point_idx,
        sorted_valid=sorted_valid,
        tile_starts=tile_starts,
        tile_ends=tile_ends,
        point_kept_keys=point_kept_keys,
        total_keys=total_emitted,
        key_overflow=key_overflow,
        tile_cap_overflow=jnp.sum(count_full) - total_emitted,
        big_point_overflow=big_point_overflow,
        point_data=point_data,
    )
