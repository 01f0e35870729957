"""Pallas TPU kernels for per-tile front-to-back alpha blending.

TPU-native re-design of the reference's two hottest kernels:
- forward blend `gaussian_point_rasterisation`
  (reference: GaussianPointCloudRasterisation.py:318-485)
- backward blend `gaussian_point_rasterisation_backward` pixel phase
  (reference: :488-705)

The CUDA structure (one 256-thread block per 16x16 tile, per-thread sequential
loop over depth-sorted points, shared-memory staging, atomics for gradient
scatter) maps to TPU as:

- grid = (num_tiles,); each program owns one 16x16 tile = 256 pixels laid out
  on VPU sublanes, and walks its depth-sorted key segment in CHUNK-column
  slabs DMA'd from HBM to VMEM (the VMEM staging replaces CUDA shared memory).
- the inherently sequential transmittance recursion is *vectorized across the
  chunk* with a prefix-product: T_i = T_carry * prod_{j<i} (1-a_j), computed
  as an f32 Hillis-Steele lane scan on the VPU (log2(CHUNK) roll+multiply
  steps, no transcendentals). Saturation (T < 1e-4 stop, reference: :457-460) becomes a
  cumulative-or along the chunk plus a carried latch, reproducing the exact
  "saturating point does not contribute" semantics.
- color/depth/weight accumulation and the backward's per-point reductions are
  MXU matmuls against the chunk slab; per-point gradients are written back
  per *key slot* (no atomics) and reduced to points outside the kernel via
  the emission permutation (see ops/tiling.py).
- the backward replays the forward front-to-back and uses the suffix-sum
  identity dC/da_i = c_i T_i - w_i/(1-a_i) with w_i = C_total - prefix_i
  (reference derives the same quantity back-to-front, :561-565,643-656).

Gradient conventions copied from the reference backward:
- the 0.99 alpha clamp is a straight-through gate (reference: :658-662)
- alpha < 1/255 skip gate passes no gradient (reference: :634)
- no gradient to the depth output or through the density rescale
  (reference: :1026, utils.py:347)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import TILE_WIDTH, TILE_HEIGHT

# Row layout of the (16, MAX_KEYS) per-key slab
ROW_U = 0
ROW_V = 1
ROW_A = 2      # conic a
ROW_B = 3      # conic b
ROW_C = 4      # conic c
ROW_LOGW = 5   # log(rescale * sigmoid(alpha_logit))
# rows 6..7 padding (keeps the accumulation slab rows 8..15 sublane-aligned)
ROW_R = 8
ROW_G = 9
ROW_B_COL = 10
ROW_DEPTH = 11
ROW_ONE = 12
NUM_DATA_ROWS = 16

# Row layout of the (16, MAX_KEYS) backward per-key gradient slab
GROW_DU = 0
GROW_DV = 1
GROW_DA = 2
GROW_DB = 3
GROW_DC = 4
GROW_DLOGW = 5
GROW_DR = 8
GROW_DG = 9
GROW_DB_COL = 10
GROW_MAG_UV = 11       # sum over pixels of |viewspace grad| L2 norm
GROW_NUM_PIXELS = 12   # number of pixels this key contributed to

PIXELS_PER_TILE = TILE_WIDTH * TILE_HEIGHT  # 256

ALPHA_SKIP_THRESHOLD = 1.0 / 255.0
ALPHA_CLAMP = 0.99
TRANSMITTANCE_SATURATION = 1e-4

# Forward per-tile output columns in the (num_tiles, 256, 8) buffer
OUT_R, OUT_G, OUT_B, OUT_DEPTH, OUT_ACC_ALPHA, OUT_NORM, OUT_LAST_EFF, OUT_COUNT = range(8)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_right_lanes(x, k, fill, interpret):
    """Shift columns right by k, filling `fill` (no wraparound). The fill
    mask is built (1, C) and broadcast into the select - a full-size iota per
    scan step costs ~3x the select itself on the VPU."""
    rolled = jnp.roll(x, k, 1) if interpret else pltpu.roll(x, k, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    return jnp.where(lane < k, jnp.full_like(x, fill), rolled)


def _lane_cumsum_exclusive(x, interpret=False):
    """Exclusive prefix sum along axis 1 (lanes): Hillis-Steele doubling scan
    on the VPU, log2(C) roll+add steps, exact f32."""
    c = x.shape[1]
    acc = _shift_right_lanes(x, 1, 0.0, interpret)
    k = 1
    while k < c:
        acc = acc + _shift_right_lanes(acc, k, 0.0, interpret)
        k *= 2
    return acc


def _saturation_masks(a_v, T_i, one_minus, T, sat):
    """Scan-free saturation semantics.

    tnext = T_i * (1 - a) is non-increasing along the chunk, so "some positive
    lane before me saturated" is simply "my tnext < threshold" for positive
    lanes - the prefix-count scan the reference's per-thread `break` would
    otherwise require collapses to one compare. The saturating lane itself
    does not contribute (reference: :457-460) and the transmittance carry
    only advances on contribution (reference: :470): the post-chunk T is the
    T_i of the first saturating lane (the row-max of T_i over hits, since T_i
    is non-increasing too), or tnext's last lane if nothing saturated, frozen
    entirely once the pixel latched in an earlier chunk.

    Returns (contribute, T_new, sat_new), shapes (256, C)/(256, 1)/(256, 1).
    """
    tnext = T_i * one_minus
    positive = (a_v > 0.0).astype(jnp.float32)
    hit = positive * (tnext < TRANSMITTANCE_SATURATION).astype(jnp.float32)
    contribute = (positive
                  * (tnext >= TRANSMITTANCE_SATURATION).astype(jnp.float32)
                  * (1.0 - sat))
    row_hit = jnp.max(hit, axis=1, keepdims=True)
    T_at_hit = jnp.max(T_i * hit, axis=1, keepdims=True)
    T_new = jnp.where(row_hit > 0.5, T_at_hit, tnext[:, -1:])
    T_new = jnp.where(sat > 0.5, T, T_new)
    sat_new = jnp.maximum(sat, row_hit)
    return contribute, T_new, sat_new


def _lane_cumprod_exclusive(x, interpret=False):
    """Exclusive prefix *product* along lanes.

    Used for the transmittance recursion T_i = T * prod_{j<i} (1 - a_j):
    pure IEEE f32 multiplies (no log/exp), so results are reproducible across
    interpret/compiled backends and the 1e-4 saturation threshold
    (reference: :457-460) doesn't flip on transcendental rounding.
    """
    c = x.shape[1]
    acc = _shift_right_lanes(x, 1, 1.0, interpret)
    k = 1
    while k < c:
        acc = acc * _shift_right_lanes(acc, k, 1.0, interpret)
        k *= 2
    return acc


def _tile_pixel_coords(tile_id, tiles_per_row):
    """Pixel-center coordinates of a tile's 256 pixels, shape (256, 1)."""
    tile_u = tile_id % tiles_per_row
    tile_v = tile_id // tiles_per_row
    idx = jax.lax.broadcasted_iota(jnp.int32, (PIXELS_PER_TILE, 1), 0)
    u_in = idx % TILE_WIDTH
    v_in = idx // TILE_WIDTH
    px = (tile_u * TILE_WIDTH + u_in).astype(jnp.float32) + 0.5
    py = (tile_v * TILE_HEIGHT + v_in).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(data, px, py, start, end, chunk_global_start, chunk):
    """Per-(pixel, key) alphas for one chunk slab.

    Returns (a_exp, a_v): unclamped exp(exponent) and the masked/clamped alpha
    used for blending. Shapes (256, chunk).
    """
    u = data[ROW_U:ROW_U + 1, :]
    v = data[ROW_V:ROW_V + 1, :]
    ca = data[ROW_A:ROW_A + 1, :]
    cb = data[ROW_B:ROW_B + 1, :]
    cc = data[ROW_C:ROW_C + 1, :]
    logw = data[ROW_LOGW:ROW_LOGW + 1, :]
    dx = px - u   # (256, chunk)
    dy = py - v
    exponent = (-0.5 * (dx * dx * ca + dy * dy * cc) - dx * dy * cb + logw)
    a_exp = jnp.exp(exponent)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    gidx = chunk_global_start + lane
    in_segment = (gidx >= start) & (gidx < end)
    a_v = jnp.where(a_exp < ALPHA_SKIP_THRESHOLD, 0.0,
                    jnp.minimum(a_exp, ALPHA_CLAMP))
    a_v = jnp.where(in_segment, a_v, 0.0)
    return a_exp, a_v, dx, dy, gidx


def _forward_kernel(starts_ref, ends_ref,       # scalar prefetch (SMEM)
                    data_hbm,                   # (16, MAX_KEYS) in ANY/HBM
                    out_ref,                    # (1, 256, 8) VMEM block
                    chunk_buf, dma_sem,         # scratch (2-slot double buffer)
                    *, chunk, tiles_per_row, interpret):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    aligned_start = (start // chunk) * chunk
    num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, chunk), 0)
    px, py = _tile_pixel_coords(t, tiles_per_row)

    def get_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(aligned_start + i * chunk, chunk)],
            chunk_buf.at[slot], dma_sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0).start()

    def cond(state):
        i, T, sat, acc, last_eff, count = state
        return (i < num_chunks) & jnp.logical_not(jnp.all(sat > 0.5))

    def body(state):
        i, T, sat, acc, last_eff, count = state
        col0 = aligned_start + i * chunk

        @pl.when(i + 1 < num_chunks)
        def _():
            get_dma(i + 1).start()

        get_dma(i).wait()
        data = chunk_buf[jax.lax.rem(i, 2)]

        a_exp, a_v, _, _, gidx = _chunk_alpha(
            data, px, py, start, end, col0, chunk)
        one_minus = 1.0 - a_v                                # (256, chunk)

        # transmittance recursion via one VPU doubling scan; saturation
        # handled scan-free (see _saturation_masks)
        T_i = T * _lane_cumprod_exclusive(one_minus, interpret)
        contribute, T, sat = _saturation_masks(a_v, T_i, one_minus, T, sat)

        weight = contribute * a_v * T_i
        slab = data[8:16, :]                                  # r,g,b,depth,one
        acc = acc + jax.lax.dot_general(
            weight, slab, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (256, 8)

        eff = jnp.max(contribute * (gidx + 1).astype(jnp.float32),
                      axis=1, keepdims=True)
        last_eff = jnp.maximum(last_eff, eff)
        count = count + jnp.sum(contribute, axis=1, keepdims=True)
        return (i + 1, T, sat, acc, last_eff, count)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((PIXELS_PER_TILE, 1), jnp.float32),   # T
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),  # saturated latch
        jnp.zeros((PIXELS_PER_TILE, 8), jnp.float32),  # acc slab
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),  # last effective + 1
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),  # valid count
    )
    i_final, T, _, acc, last_eff, count = jax.lax.while_loop(cond, body, init)

    # drain the prefetch issued for the chunk after an early saturation exit
    @pl.when((i_final < num_chunks) & (num_chunks > 0))
    def _():
        get_dma(i_final).wait()

    depth = acc[:, 3:4] / jnp.maximum(acc[:, 4:5], 1e-6)
    out = jnp.concatenate([
        acc[:, 0:3],            # r, g, b
        depth,                  # normalized depth
        1.0 - T,                # accumulated alpha
        acc[:, 4:5],            # weight normalization
        last_eff,               # last effective key offset + 1 (as float)
        count,                  # valid point count (as float)
    ], axis=1)
    out_ref[0, :, :] = out


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_forward(point_data, tile_starts, tile_ends, *,
                  num_tiles, tiles_per_row, chunk=128):
    """point_data: (16, MAX_KEYS) f32, columns in sorted key order.

    Returns (num_tiles, 256, 8) per-tile outputs (see OUT_* columns).
    """
    assert point_data.shape[0] == NUM_DATA_ROWS
    max_keys = point_data.shape[1]
    assert max_keys % chunk == 0, "MAX_KEYS must be a multiple of chunk"
    interpret = _use_interpret()
    kernel = functools.partial(_forward_kernel, chunk=chunk,
                               tiles_per_row=tiles_per_row,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, PIXELS_PER_TILE, 8),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIXELS_PER_TILE, 8),
                                       jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_ends, point_data)
    return out


def _forward_rgb_kernel(starts_ref, ends_ref,     # scalar prefetch (SMEM)
                        data_hbm,                 # (16, MAX_KEYS) ANY/HBM
                        out_ref,                  # (1, 256, 8) VMEM block
                        chunk_buf, dma_sem,       # 2-slot double buffer
                        *, chunk, tiles_per_row, interpret):
    """Inference-only forward blend (reference rgb_only template flag,
    reference: GaussianPointCloudRasterisation.py:342,409,464).

    Differences from `_forward_kernel`:
    - conic rows arrive pre-scaled (A = -a/2, B = -b, C = -c/2), saving the
      per-(pixel, key) negations and halvings in the exponent;
    - no last-effective-offset / valid-count bookkeeping (backward-only
      outputs, skipped exactly like the reference's rgb_only template).
    """
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    aligned_start = (start // chunk) * chunk
    num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, chunk), 0)
    px, py = _tile_pixel_coords(t, tiles_per_row)

    def get_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(aligned_start + i * chunk, chunk)],
            chunk_buf.at[slot], dma_sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0).start()

    def cond(state):
        i, T, sat, acc = state
        return (i < num_chunks) & jnp.logical_not(jnp.all(sat > 0.5))

    def body(state):
        i, T, sat, acc = state
        col0 = aligned_start + i * chunk

        @pl.when(i + 1 < num_chunks)
        def _():
            get_dma(i + 1).start()

        get_dma(i).wait()
        data = chunk_buf[jax.lax.rem(i, 2)]

        dx = px - data[ROW_U:ROW_U + 1, :]
        dy = py - data[ROW_V:ROW_V + 1, :]
        exponent = ((data[ROW_A:ROW_A + 1, :] * dx
                     + data[ROW_B:ROW_B + 1, :] * dy) * dx
                    + (data[ROW_C:ROW_C + 1, :] * dy * dy
                       + data[ROW_LOGW:ROW_LOGW + 1, :]))
        a_exp = jnp.exp(exponent)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        gidx = col0 + lane
        in_segment = (gidx >= start) & (gidx < end)
        a_v = jnp.where(in_segment & (a_exp >= ALPHA_SKIP_THRESHOLD),
                        jnp.minimum(a_exp, ALPHA_CLAMP), 0.0)
        one_minus = 1.0 - a_v
        T_i = T * _lane_cumprod_exclusive(one_minus, interpret)
        contribute, T, sat = _saturation_masks(a_v, T_i, one_minus, T, sat)
        weight = contribute * a_v * T_i
        acc = acc + jax.lax.dot_general(
            weight, data[8:16, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return (i + 1, T, sat, acc)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((PIXELS_PER_TILE, 1), jnp.float32),   # T
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),  # saturated latch
        jnp.zeros((PIXELS_PER_TILE, 8), jnp.float32),  # acc slab
    )
    i_final, T, _, acc = jax.lax.while_loop(cond, body, init)

    @pl.when((i_final < num_chunks) & (num_chunks > 0))
    def _():
        get_dma(i_final).wait()

    zeros = jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32)
    out_ref[0, :, :] = jnp.concatenate([
        acc[:, 0:3],            # r, g, b
        zeros,                  # depth (not computed in rgb_only)
        1.0 - T,                # accumulated alpha
        acc[:, 4:5],            # weight normalization
        zeros, zeros,           # last_eff / count (not computed)
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_forward_rgb(point_data, tile_starts, tile_ends, *,
                      num_tiles, tiles_per_row, chunk=128):
    """rgb_only forward: point_data rows 2..4 must hold the PRE-SCALED conic
    (A, B, C) = (-a/2, -b, -c/2). Returns (num_tiles, 256, 8) with the
    backward-only columns (depth, last_eff, count) zeroed."""
    assert point_data.shape[0] == NUM_DATA_ROWS
    max_keys = point_data.shape[1]
    assert max_keys % chunk == 0, "MAX_KEYS must be a multiple of chunk"
    interpret = _use_interpret()
    kernel = functools.partial(_forward_rgb_kernel, chunk=chunk,
                               tiles_per_row=tiles_per_row,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, PIXELS_PER_TILE, 8),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIXELS_PER_TILE, 8),
                                       jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_ends, point_data)
    return out


def _backward_kernel(starts_ref, ends_ref,
                     data_hbm,          # (16, MAX_KEYS) ANY
                     pix_ref,           # (1, 256, 8): g_rgb, C_total_rgb
                     zeros_ref,         # (16, MAX_KEYS) ANY, aliased to output
                     grad_hbm,          # output alias: (16, MAX_KEYS) ANY
                     mag_ref,           # output (1, 256, 8): mag_u, mag_v
                     chunk_buf, grad_buf, dma_sem, grad_sem,
                     *, chunk, tiles_per_row, interpret):
    del zeros_ref  # same buffer as grad_hbm (input_output_aliases)
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    aligned_start = (start // chunk) * chunk
    num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, chunk), 0)
    px, py = _tile_pixel_coords(t, tiles_per_row)

    def get_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(aligned_start + i * chunk, chunk)],
            chunk_buf.at[slot], dma_sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0).start()

    g_rgb = pix_ref[0, :, 0:3]        # (256, 3) image cotangent
    c_total = pix_ref[0, :, 3:6]      # (256, 3) forward output color
    # S = sum_ch g * C_total  (suffix-sum anchor)
    S = jnp.sum(g_rgb * c_total, axis=1, keepdims=True)  # (256, 1)
    g8 = pix_ref[0, :, :]             # (256, 8)

    def cond(state):
        i, T, sat, Pg, mag_img = state
        return (i < num_chunks) & jnp.logical_not(jnp.all(sat > 0.5))

    def body(state):
        i, T, sat, Pg, mag_img = state
        col0 = aligned_start + i * chunk

        @pl.when(i + 1 < num_chunks)
        def _():
            get_dma(i + 1).start()

        get_dma(i).wait()
        data = chunk_buf[jax.lax.rem(i, 2)]

        a_exp, a_v, dx, dy, _ = _chunk_alpha(
            data, px, py, start, end, col0, chunk)
        one_minus = 1.0 - a_v

        T_i = T * _lane_cumprod_exclusive(one_minus, interpret)
        contribute, T_next, sat_next = _saturation_masks(
            a_v, T_i, one_minus, T, sat)
        weight = contribute * a_v * T_i                       # (256, chunk)

        # cg[px, i] = sum_ch color[i, ch] * g[px, ch]
        rgb_rows = data[ROW_R:ROW_R + 3, :]                   # (3, chunk)
        cg = jax.lax.dot_general(
            g_rgb, rgb_rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (256, chunk)

        # inclusive prefix of u_j = cg_j * weight_j within the chunk
        u_map = cg * weight
        cum_u_incl = _lane_cumsum_exclusive(u_map, interpret) + u_map
        gw = S - Pg - cum_u_incl       # sum_ch g * w_i (suffix after i)
        dLda = contribute * (cg * T_i - gw / (1.0 - a_v))     # (256, chunk)
        G = dLda * a_exp               # straight-through clamp/skip chain

        # per-key moment reductions on the MXU
        one = jnp.ones_like(px)
        mono = jnp.concatenate(
            [one, px, py, px * px, py * py, px * py,
             jnp.zeros_like(px), jnp.zeros_like(px)], axis=1)  # (256, 8)
        mom = jax.lax.dot_general(
            mono, G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (8, chunk)
        m0, mx, my = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        mxx, myy, mxy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
        u = data[ROW_U:ROW_U + 1, :]
        v = data[ROW_V:ROW_V + 1, :]
        ca = data[ROW_A:ROW_A + 1, :]
        cb = data[ROW_B:ROW_B + 1, :]
        cc = data[ROW_C:ROW_C + 1, :]
        cmx = mx - u * m0              # sum G * dx
        cmy = my - v * m0              # sum G * dy
        du = ca * cmx + cb * cmy
        dv = cc * cmy + cb * cmx
        da = -0.5 * (mxx - 2.0 * u * mx + u * u * m0)
        dc = -0.5 * (myy - 2.0 * v * my + v * v * m0)
        db = -(mxy - u * my - v * mx + u * v * m0)

        # color grads (+ free rows) : (8, chunk)
        dcol = jax.lax.dot_general(
            g8, weight, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        # viewspace gradient maps for densification statistics
        gx = G * (ca * dx + cb * dy)
        gy = G * (cc * dy + cb * dx)
        mag_pt = jnp.sum(jnp.sqrt(gx * gx + gy * gy), axis=0, keepdims=True)
        npix = jnp.sum(contribute, axis=0, keepdims=True)
        mag_img = mag_img + jnp.concatenate(
            [jnp.sum(jnp.abs(gx), axis=1, keepdims=True),
             jnp.sum(jnp.abs(gy), axis=1, keepdims=True)], axis=1)

        zeros = jnp.zeros_like(du)
        grad_slab = jnp.concatenate([
            du, dv, da, db, dc, m0,            # rows 0..5 (m0 == dlogw)
            zeros, zeros,
            dcol[0:1, :], dcol[1:2, :], dcol[2:3, :],
            mag_pt, npix, zeros, zeros, zeros,
        ], axis=0)                                            # (16, chunk)

        # read-modify-write keeps neighbors' boundary columns intact; the
        # output buffer is donated zeros and the TPU grid runs sequentially.
        rcopy = pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(col0, chunk)], grad_buf, grad_sem)
        rcopy.start()
        rcopy.wait()
        grad_buf[:] = grad_buf[:] + grad_slab
        wcopy = pltpu.make_async_copy(
            grad_buf, grad_hbm.at[:, pl.ds(col0, chunk)], grad_sem)
        wcopy.start()
        wcopy.wait()

        # advance carries
        Pg = Pg + jnp.sum(u_map, axis=1, keepdims=True)
        return (i + 1, T_next, sat_next, Pg, mag_img)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((PIXELS_PER_TILE, 1), jnp.float32),
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),
        jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),
        jnp.zeros((PIXELS_PER_TILE, 2), jnp.float32),
    )
    i_final, _, _, _, mag_img = jax.lax.while_loop(cond, body, init)

    @pl.when((i_final < num_chunks) & (num_chunks > 0))
    def _():
        get_dma(i_final).wait()

    mag_ref[0, :, :] = jnp.concatenate(
        [mag_img, jnp.zeros((PIXELS_PER_TILE, 6), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_backward(point_data, tile_starts, tile_ends, pixel_in, *,
                   num_tiles, tiles_per_row, chunk=128):
    """Backward pass of the tile blend.

    pixel_in: (num_tiles, 256, 8) with columns [g_r, g_g, g_b, C_r, C_g, C_b,
    0, 0] (image cotangent and forward color output, per tile pixel).

    Returns:
      grad_data: (16, MAX_KEYS) per-key gradients (GROW_* rows)
      mag_image: (num_tiles, 256, 8) with columns [mag_u, mag_v, 0...]
    """
    max_keys = point_data.shape[1]
    assert max_keys % chunk == 0
    interpret = _use_interpret()
    zeros_grad = jnp.zeros((NUM_DATA_ROWS, max_keys), jnp.float32)
    kernel = functools.partial(_backward_kernel, chunk=chunk,
                               tiles_per_row=tiles_per_row,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIXELS_PER_TILE, 8), lambda t, s, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros to alias as grad out
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIXELS_PER_TILE, 8), lambda t, s, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.VMEM((NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    grad_data, mag_image = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NUM_DATA_ROWS, max_keys), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIXELS_PER_TILE, 8), jnp.float32),
        ),
        # zeros input (index 4 incl. 2 scalar-prefetch + data + pix)
        # aliases the grad_data output so read-modify-write accumulation works
        input_output_aliases={4: 0},
        interpret=interpret,
    )(tile_starts, tile_ends, point_data, pixel_in, zeros_grad)
    return grad_data, mag_image
