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
  on VPU *lanes*, and walks its depth-sorted key segment in CHUNK-row slabs
  DMA'd from HBM to VMEM (the VMEM staging replaces CUDA shared memory).
- layout is (keys on SUBLANES, pixels on LANES): the inherently sequential
  transmittance recursion becomes a sublane Hillis-Steele prefix product
  (log2(CHUNK) sublane rolls - measured ~5x cheaper than the same scan along
  lanes, which goes through the lane crossbar).
- the per-(pixel, key) Gaussian exponent is ONE MXU matmul per chunk:
  exp(E) with E[k, p] = coef(8, C)[., k] . mono(256, 8)[p, .], where the
  quadratic coefficients are derived per *key* (C-sized rows, ~free) in
  tile-centered coordinates. Tile-centering keeps |terms| ~ O(radius^2)
  so the f32 expansion does not suffer the cancellation a global-coordinate
  quadratic would (px^2 ~ 1e6 vs exponent ~ 1).
- saturation (T < 1e-4 stop, reference: :457-460) is scan-free: a compare on
  the non-increasing T_next plus a carried latch reproduces the exact
  "saturating point does not contribute" semantics.
- per-point gradients are written back per *key slot* (no atomics) and
  reduced to points outside the kernel via the emission permutation
  (see ops/tiling.py).
- the backward replays the forward front-to-back and uses the suffix-sum
  identity dC/da_i = c_i T_i - w_i/(1-a_i) with w_i = C_total - prefix_i
  (reference derives the same quantity back-to-front, :561-565,643-656).

Gradient conventions copied from the reference backward:
- the 0.99 alpha clamp is a straight-through gate (reference: :658-662)
- alpha < 1/255 skip gate passes no gradient (reference: :634)
- no gradient to the depth output or through the density rescale
  (reference: :1026, utils.py:347)

Tile output layout: (num_tiles, 8, 256) - 8 output channels on sublanes,
256 tile pixels on lanes (pixel p = v_in * 16 + u_in).
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
# packed8 slab (inference): 8 int32 rows [u, v, ca, cb, cc, logw (f32
# bitcasts), bf16(r)|bf16(g), bf16(b)|bf16(depth)] - see ops/tiling.py
# _packed8_slab. Halves the gathered table bytes at megapoint scale.
PACKED_DATA_ROWS = 8

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

from .gaussian import ALPHA_SKIP_THRESHOLD  # noqa: F401 (canonical constant)
ALPHA_CLAMP = 0.99
TRANSMITTANCE_SATURATION = 1e-4

# Forward per-tile output rows in the (num_tiles, 8, 256) buffer
OUT_R, OUT_G, OUT_B, OUT_DEPTH, OUT_ACC_ALPHA, OUT_NORM, OUT_LAST_EFF, OUT_COUNT = range(8)

_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_rows(x, k, interpret):
    return jnp.roll(x, k, 0) if interpret else pltpu.roll(x, k, 0)


def _sub_cumprod_exclusive(x, interpret=False):
    """Exclusive prefix *product* along axis 0 (sublanes).

    Pure IEEE f32 multiplies (no log/exp), so results are reproducible across
    interpret/compiled backends and the 1e-4 saturation threshold
    (reference: :457-460) doesn't flip on transcendental rounding.
    """
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    acc = jnp.where(row < 1, jnp.ones_like(x), _roll_rows(x, 1, interpret))
    k = 1
    while k < n:
        rolled = _roll_rows(acc, k, interpret)
        acc = acc * jnp.where(row < k, jnp.ones_like(acc), rolled)
        k *= 2
    return acc


def _sub_cumsum_exclusive(x, interpret=False):
    """Exclusive prefix sum along axis 0 (sublanes)."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    acc = jnp.where(row < 1, jnp.zeros_like(x), _roll_rows(x, 1, interpret))
    k = 1
    while k < n:
        rolled = _roll_rows(acc, k, interpret)
        acc = acc + jnp.where(row < k, jnp.zeros_like(acc), rolled)
        k *= 2
    return acc


def _tile_mono(tile_id, tiles_per_row):
    """Per-pixel monomials in tile-local coordinates.

    Returns (mono, q, r): mono (256, 8) = [q^2, q*r, r^2, q, r, 1, 0, 0] with
    q, r (1, 256) the pixel-center offsets from the tile origin.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (PIXELS_PER_TILE, 1), 0)
    q = (idx % TILE_WIDTH).astype(jnp.float32) + 0.5    # (256, 1)
    r = (idx // TILE_WIDTH).astype(jnp.float32) + 0.5
    one = jnp.ones_like(q)
    zero = jnp.zeros_like(q)
    mono = jnp.concatenate(
        [q * q, q * r, r * r, q, r, one, zero, zero], axis=1)   # (256, 8)
    return mono, q.reshape(1, -1), r.reshape(1, -1)


def _tile_origin(tile_id, tiles_per_row):
    tile_u = tile_id % tiles_per_row
    tile_v = tile_id // tiles_per_row
    tcx = (tile_u * TILE_WIDTH).astype(jnp.float32)
    tcy = (tile_v * TILE_HEIGHT).astype(jnp.float32)
    return tcx, tcy


def _slab_views(data):
    """Unify the two slab layouts into (head6, out_slab) f32 views.

    head6: rows [u, v, ca, cb, cc, logw] (6, C) - what _chunk_coefs reads.
    out_slab: rows [r, g, b, depth, one, 0, 0, 0] (8, C) - the MXU
    accumulation operand.

    wide16 f32 slabs pass through as plain slices; packed8 int32 slabs
    (see ops/tiling.py _packed8_slab) bitcast rows 0..5 back to f32 and
    split rows 6..7 into their bf16 halves (a bf16's bits ARE the top 16
    of the f32 pattern, so the unpack is mask/shift + bitcast - no
    conversion math)."""
    if data.dtype == jnp.float32:
        return data[0:6, :], data[8:16, :]
    head = jax.lax.bitcast_convert_type(data[0:6, :], jnp.float32)
    hi_mask = jnp.int32(-1 << 16)
    rg = data[6:7, :]
    bd = data[7:8, :]
    r = jax.lax.bitcast_convert_type(rg & hi_mask, jnp.float32)
    g = jax.lax.bitcast_convert_type(rg << 16, jnp.float32)
    b = jax.lax.bitcast_convert_type(bd & hi_mask, jnp.float32)
    dpt = jax.lax.bitcast_convert_type(bd << 16, jnp.float32)
    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    return head, jnp.concatenate([r, g, b, dpt, one, zero, zero, zero],
                                 axis=0)


def _chunk_coefs(data, tcx, tcy):
    """Tile-centered quadratic coefficients from the raw slab rows.

    exponent(k, p) = -0.5*ca*dx^2 - cb*dx*dy - 0.5*cc*dy^2 + logw with
    dx = q_p - du_k, dy = r_p - dv_k, du = u - tile_x0, dv = v - tile_y0.
    All rows are (1, C): per-key cost, 256x cheaper than per-(pixel, key).

    Returns (coef (8, C), du, dv) with coef rows
    [c_qq, c_qr, c_rr, c_q, c_r, c_1, 0, 0].
    """
    u = data[ROW_U:ROW_U + 1, :]
    v = data[ROW_V:ROW_V + 1, :]
    ca = data[ROW_A:ROW_A + 1, :]
    cb = data[ROW_B:ROW_B + 1, :]
    cc = data[ROW_C:ROW_C + 1, :]
    logw = data[ROW_LOGW:ROW_LOGW + 1, :]
    du = u - tcx
    dv = v - tcy
    c_q = ca * du + cb * dv
    c_r = cc * dv + cb * du
    c_1 = logw - 0.5 * (ca * du * du + cc * dv * dv) - cb * du * dv
    zero = jnp.zeros_like(u)
    coef = jnp.concatenate(
        [-0.5 * ca, -cb, -0.5 * cc, c_q, c_r, c_1, zero, zero], axis=0)
    return coef, du, dv


def _chunk_alpha(data, mono, tcx, tcy, start, end, chunk_global_start, chunk):
    """Per-(key, pixel) alphas for one chunk slab; exponent on the MXU.

    Returns (a_exp, a_v, coef, du, dv, gidx): (chunk, 256) maps, the (8,
    chunk) coefficient rows, (1, chunk) rows for du/dv, (chunk, 1) gidx.
    """
    coef, du, dv = _chunk_coefs(data, tcx, tcy)
    exponent = jax.lax.dot_general(
        coef, mono, (((0,), (1,)), ((), ())), **_DOT)       # (chunk, 256)
    a_exp = jnp.exp(exponent)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    gidx = chunk_global_start + row
    in_segment = (gidx >= start) & (gidx < end)
    a_v = jnp.where(in_segment & (a_exp >= ALPHA_SKIP_THRESHOLD),
                    jnp.minimum(a_exp, ALPHA_CLAMP), 0.0)
    return a_exp, a_v, coef, du, dv, gidx


def _saturation_masks(a_v, T_i, one_minus, T, sat):
    """Scan-free saturation semantics (keys on sublanes).

    tnext = T_i * (1 - a) is non-increasing along the chunk, so "some positive
    key before me saturated" is simply "my tnext < threshold" for positive
    keys - the prefix-count scan the reference's per-thread `break` would
    otherwise require collapses to one compare. The saturating key itself
    does not contribute (reference: :457-460) and the transmittance carry
    only advances on contribution (reference: :470): the post-chunk T is the
    T_i of the first saturating key (the column-max of T_i over hits, since
    T_i is non-increasing too), or tnext's last key if nothing saturated,
    frozen entirely once the pixel latched in an earlier chunk.

    Returns (contribute, T_new, sat_new), shapes (C, 256)/(1, 256)/(1, 256).
    """
    tnext = T_i * one_minus
    positive = (a_v > 0.0).astype(jnp.float32)
    hit = positive * (tnext < TRANSMITTANCE_SATURATION).astype(jnp.float32)
    contribute = (positive
                  * (tnext >= TRANSMITTANCE_SATURATION).astype(jnp.float32)
                  * (1.0 - sat))
    col_hit = jnp.max(hit, axis=0, keepdims=True)
    T_at_hit = jnp.max(T_i * hit, axis=0, keepdims=True)
    T_new = jnp.where(col_hit > 0.5, T_at_hit, tnext[-1:, :])
    T_new = jnp.where(sat > 0.5, T, T_new)
    sat_new = jnp.maximum(sat, col_hit)
    return contribute, T_new, sat_new


def _forward_kernel(starts_ref, ends_ref,       # scalar prefetch (SMEM)
                    data_hbm,                   # (16, MAX_KEYS) in ANY/HBM
                    out_ref,                    # (1, 8, 256) VMEM block
                    chunk_buf, dma_sem,         # scratch (2-slot double buffer)
                    *, chunk, tiles_per_row, rgb_only, interpret):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    aligned_start = (start // chunk) * chunk
    num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, chunk), 0)
    mono, _, _ = _tile_mono(t, tiles_per_row)
    tcx, tcy = _tile_origin(t, tiles_per_row)

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
        head, slab = _slab_views(data)       # (6, chunk) coefs; (8, chunk)
        #   [r, g, b, depth, one, 0...] accumulation operand (wide16 slices
        #   through; packed8 bitcast-unpacks - see _slab_views)

        a_exp, a_v, _, _, _, gidx = _chunk_alpha(
            head, mono, tcx, tcy, start, end, col0, chunk)
        one_minus = 1.0 - a_v                                # (chunk, 256)

        # transmittance recursion via one sublane doubling scan; saturation
        # handled scan-free (see _saturation_masks)
        T_i = T * _sub_cumprod_exclusive(one_minus, interpret)
        contribute, T, sat = _saturation_masks(a_v, T_i, one_minus, T, sat)

        weight = contribute * a_v * T_i                       # (chunk, 256)
        acc = acc + jax.lax.dot_general(
            slab, weight, (((1,), (0,)), ((), ())), **_DOT)   # (8, 256)

        if not rgb_only:
            eff = jnp.max(contribute * (gidx + 1).astype(jnp.float32),
                          axis=0, keepdims=True)
            last_eff = jnp.maximum(last_eff, eff)
            count = count + jnp.sum(contribute, axis=0, keepdims=True)
        return (i + 1, T, sat, acc, last_eff, count)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, PIXELS_PER_TILE), jnp.float32),   # T
        jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),  # saturated latch
        jnp.zeros((8, PIXELS_PER_TILE), jnp.float32),  # acc slab
        jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),  # last effective + 1
        jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),  # valid count
    )
    i_final, T, _, acc, last_eff, count = jax.lax.while_loop(cond, body, init)

    # drain the prefetch issued for the chunk after an early saturation exit
    @pl.when((i_final < num_chunks) & (num_chunks > 0))
    def _():
        get_dma(i_final).wait()

    if rgb_only:
        zero = jnp.zeros((1, PIXELS_PER_TILE), jnp.float32)
        out = jnp.concatenate([
            acc[0:3],               # r, g, b
            zero,                   # depth (not computed in rgb_only)
            1.0 - T,                # accumulated alpha
            acc[4:5],               # weight normalization
            zero, zero,             # last_eff / count (not computed)
        ], axis=0)
    else:
        depth = acc[3:4] / jnp.maximum(acc[4:5], 1e-6)
        out = jnp.concatenate([
            acc[0:3],               # r, g, b
            depth,                  # normalized depth
            1.0 - T,                # accumulated alpha
            acc[4:5],               # weight normalization
            last_eff,               # last effective key offset + 1 (as float)
            count,                  # valid point count (as float)
        ], axis=0)
    out_ref[0, :, :] = out


def _forward_call(point_data, tile_starts, tile_ends, *,
                  num_tiles, tiles_per_row, chunk, rgb_only):
    data_rows = point_data.shape[0]
    assert data_rows in (NUM_DATA_ROWS, PACKED_DATA_ROWS)
    # packed8 slabs are int32 (bitcast rows) and inference-only
    assert point_data.dtype == (
        jnp.int32 if data_rows == PACKED_DATA_ROWS else jnp.float32)
    assert rgb_only or data_rows == NUM_DATA_ROWS, \
        "packed8 slab is rgb_only-only (training keeps the exact wide16)"
    max_keys = point_data.shape[1]
    assert max_keys % chunk == 0, "MAX_KEYS must be a multiple of chunk"
    interpret = _use_interpret()
    kernel = functools.partial(_forward_kernel, chunk=chunk,
                               tiles_per_row=tiles_per_row,
                               rgb_only=rgb_only, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, PIXELS_PER_TILE),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, data_rows, chunk), point_data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, PIXELS_PER_TILE),
                                       jnp.float32),
        interpret=interpret,
    )(tile_starts, tile_ends, point_data)


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_forward(point_data, tile_starts, tile_ends, *,
                  num_tiles, tiles_per_row, chunk=128):
    """point_data: (16, MAX_KEYS) f32, columns in sorted key order.

    Returns (num_tiles, 8, 256) per-tile outputs (see OUT_* rows).
    """
    return _forward_call(point_data, tile_starts, tile_ends,
                         num_tiles=num_tiles, tiles_per_row=tiles_per_row,
                         chunk=chunk, rgb_only=False)


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_forward_rgb(point_data, tile_starts, tile_ends, *,
                      num_tiles, tiles_per_row, chunk=128):
    """Inference-only forward blend (reference rgb_only template flag,
    reference: GaussianPointCloudRasterisation.py:342,409,464): skips the
    last-effective-offset / valid-count / depth bookkeeping (backward-only
    outputs). Accepts the (16, MK) f32 wide16 slab OR the (8, MK) int32
    packed8 slab (ops/tiling.py _packed8_slab)."""
    return _forward_call(point_data, tile_starts, tile_ends,
                         num_tiles=num_tiles, tiles_per_row=tiles_per_row,
                         chunk=chunk, rgb_only=True)


def _backward_kernel(starts_ref, ends_ref,
                     data_hbm,          # (16, MAX_KEYS) ANY
                     pix_ref,           # (1, 8, 256): g_rgb, C_total_rgb
                     zeros_ref,         # (16, MAX_KEYS) ANY, aliased to output
                     grad_hbm,          # output alias: (16, MAX_KEYS) ANY
                     mag_ref,           # output (1, 8, 256): mag_u, mag_v
                     chunk_buf, grad_buf, dma_sem, grad_sem,
                     *, chunk, tiles_per_row, interpret):
    del zeros_ref  # same buffer as grad_hbm (input_output_aliases)
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    aligned_start = (start // chunk) * chunk
    num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, chunk), 0)
    mono, q, r = _tile_mono(t, tiles_per_row)   # mono (256, 8); q, r (1, 256)
    tcx, tcy = _tile_origin(t, tiles_per_row)

    def get_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(aligned_start + i * chunk, chunk)],
            chunk_buf.at[slot], dma_sem.at[slot])

    def put_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            grad_buf.at[slot],
            grad_hbm.at[:, pl.ds(aligned_start + i * chunk, chunk)],
            grad_sem.at[slot])

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0).start()

    g8 = pix_ref[0, :, :]             # (8, 256)
    g_rgb = g8[0:3, :]                # (3, 256) image cotangent
    c_total = g8[3:6, :]              # (3, 256) forward output color
    # S = sum_ch g * C_total  (suffix-sum anchor)
    S = jnp.sum(g_rgb * c_total, axis=0, keepdims=True)  # (1, 256)

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

        a_exp, a_v, coef, du, dv, _ = _chunk_alpha(
            data, mono, tcx, tcy, start, end, col0, chunk)
        one_minus = 1.0 - a_v

        T_i = T * _sub_cumprod_exclusive(one_minus, interpret)
        contribute, T_next, sat_next = _saturation_masks(
            a_v, T_i, one_minus, T, sat)
        weight = contribute * a_v * T_i                       # (chunk, 256)

        # cg[k, px] = sum_ch color[ch, k] * g[ch, px]
        rgb_rows = data[ROW_R:ROW_R + 3, :]                   # (3, chunk)
        cg = jax.lax.dot_general(
            rgb_rows, g_rgb, (((0,), (0,)), ((), ())), **_DOT)  # (chunk, 256)

        # inclusive prefix of u_j = cg_j * weight_j within the chunk
        u_map = cg * weight
        cum_u_incl = _sub_cumsum_exclusive(u_map, interpret) + u_map
        gw = S - Pg - cum_u_incl       # sum_ch g * w_i (suffix after i)
        dLda = contribute * (cg * T_i - gw / one_minus)       # (chunk, 256)
        G = dLda * a_exp               # straight-through clamp/skip chain

        # per-key moment reductions on the MXU (tile-local monomials):
        # mom_t[j, k] = sum_p mono[p, j] * G[k, p]
        mom_t = jax.lax.dot_general(
            mono, G, (((0,), (1,)), ((), ())), **_DOT)        # (8, chunk)
        m_qq, m_qr, m_rr = mom_t[0:1, :], mom_t[1:2, :], mom_t[2:3, :]
        m_q, m_r, m0 = mom_t[3:4, :], mom_t[4:5, :], mom_t[5:6, :]
        ca = data[ROW_A:ROW_A + 1, :]
        cb = data[ROW_B:ROW_B + 1, :]
        cc = data[ROW_C:ROW_C + 1, :]
        cmx = m_q - du * m0            # sum G * dx   (tile-local dx)
        cmy = m_r - dv * m0            # sum G * dy
        grad_u = ca * cmx + cb * cmy
        grad_v = cc * cmy + cb * cmx
        da = -0.5 * (m_qq - 2.0 * du * m_q + du * du * m0)
        dc = -0.5 * (m_rr - 2.0 * dv * m_r + dv * dv * m0)
        db = -(m_qr - du * m_r - dv * m_q + du * dv * m0)

        # color grads (+ free rows) : (8, chunk)
        dcol = jax.lax.dot_general(
            g8, weight, (((1,), (1,)), ((), ())), **_DOT)

        # viewspace gradient maps for densification statistics:
        # (ca*dx + cb*dy) = -dE/dq and (cc*dy + cb*dx) = -dE/dr, where E is
        # the tile-local quadratic - so both per-(key, pixel) maps come from
        # the same MXU monomial contraction as the exponent itself.
        zrow = jnp.zeros_like(du)
        coef_q = jnp.concatenate(
            [zrow, zrow, zrow, 2.0 * coef[0:1, :], coef[1:2, :],
             coef[3:4, :], zrow, zrow], axis=0)               # (8, chunk)
        coef_r = jnp.concatenate(
            [zrow, zrow, zrow, coef[1:2, :], 2.0 * coef[2:3, :],
             coef[4:5, :], zrow, zrow], axis=0)
        gx = -G * jax.lax.dot_general(
            coef_q, mono, (((0,), (1,)), ((), ())), **_DOT)   # (chunk, 256)
        gy = -G * jax.lax.dot_general(
            coef_r, mono, (((0,), (1,)), ((), ())), **_DOT)
        ones_row = jnp.ones((1, PIXELS_PER_TILE), jnp.float32)
        # per-key lane reductions as (1, chunk) rows via one-row MXU dots
        mag_pt = jax.lax.dot_general(
            ones_row, jnp.sqrt(gx * gx + gy * gy),
            (((1,), (1,)), ((), ())), **_DOT)                 # (1, chunk)
        npix = jax.lax.dot_general(
            ones_row, contribute, (((1,), (1,)), ((), ())), **_DOT)
        mag_img = mag_img + jnp.concatenate(
            [jnp.sum(jnp.abs(gx), axis=0, keepdims=True),
             jnp.sum(jnp.abs(gy), axis=0, keepdims=True)], axis=0)  # (2, 256)

        zeros = jnp.zeros_like(grad_u)
        grad_slab = jnp.concatenate([
            grad_u, grad_v, da, db, dc, m0,    # rows 0..5 (m0 == dlogw)
            zeros, zeros,
            dcol[0:1, :], dcol[1:2, :], dcol[2:3, :],
            mag_pt, npix, zeros, zeros, zeros,
        ], axis=0)                                            # (16, chunk)

        # Pipelined gradient writeback. Only the FIRST chunk of a tile can
        # overlap a neighbor's columns (the previous tile's segment may end
        # inside [aligned_start, start)), so only chunk 0 pays a blocking
        # read-modify-write; every other chunk is exclusively owned and its
        # write DMA overlaps the next chunk's compute through a 2-slot
        # buffer. The output buffer is donated zeros and the TPU grid runs
        # sequentially, so the next tile's chunk-0 read observes this
        # tile's drained writes.
        slot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            put_dma(i - 2).wait()

        @pl.when(i == 0)
        def _():
            rcopy = pltpu.make_async_copy(
                grad_hbm.at[:, pl.ds(col0, chunk)], grad_buf.at[slot],
                grad_sem.at[slot])
            rcopy.start()
            rcopy.wait()
            grad_buf[slot] = grad_buf[slot] + grad_slab

        @pl.when(i > 0)
        def _():
            grad_buf[slot] = grad_slab
        put_dma(i).start()

        # advance carries
        Pg = Pg + jnp.sum(u_map, axis=0, keepdims=True)
        return (i + 1, T_next, sat_next, Pg, mag_img)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, PIXELS_PER_TILE), jnp.float32),
        jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),
        jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),
        jnp.zeros((2, PIXELS_PER_TILE), jnp.float32),
    )
    i_final, _, _, _, mag_img = jax.lax.while_loop(cond, body, init)

    @pl.when((i_final < num_chunks) & (num_chunks > 0))
    def _():
        get_dma(i_final).wait()

    # drain the (up to two) in-flight gradient writes before the next tile's
    # chunk-0 read-modify-write can observe these columns
    @pl.when(i_final >= 2)
    def _():
        put_dma(i_final - 2).wait()

    @pl.when(i_final >= 1)
    def _():
        put_dma(i_final - 1).wait()

    mag_ref[0, :, :] = jnp.concatenate(
        [mag_img, jnp.zeros((6, PIXELS_PER_TILE), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("num_tiles", "tiles_per_row",
                                             "chunk"))
def blend_backward(point_data, tile_starts, tile_ends, pixel_in, *,
                   num_tiles, tiles_per_row, chunk=128):
    """Backward pass of the tile blend.

    pixel_in: (num_tiles, 8, 256) with rows [g_r, g_g, g_b, C_r, C_g, C_b,
    0, 0] (image cotangent and forward color output, per tile pixel).

    Returns:
      grad_data: (16, MAX_KEYS) per-key gradients (GROW_* rows)
      mag_image: (num_tiles, 8, 256) with rows [mag_u, mag_v, 0...]
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
            pl.BlockSpec((1, 8, PIXELS_PER_TILE), lambda t, s, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros to alias as grad out
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PIXELS_PER_TILE), lambda t, s, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, NUM_DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grad_data, mag_image = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NUM_DATA_ROWS, max_keys), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, PIXELS_PER_TILE), jnp.float32),
        ),
        # zeros input (index 4 incl. 2 scalar-prefetch + data + pix)
        # aliases the grad_data output so read-modify-write accumulation works
        input_output_aliases={4: 0},
        interpret=interpret,
    )(tile_starts, tile_ends, point_data, pixel_in, zeros_grad)
    return grad_data, mag_image
