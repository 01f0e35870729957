"""Public differentiable rasterizer: the TPU equivalent of the reference's
`GaussianPointCloudRasterisation` autograd bridge
(reference: GaussianPointCloudRasterisation.py:775-1204).

Pipeline (all inside one jit, static shapes throughout):
  1. per-point projection / SH / conic attributes  (ops/projection.py, jnp AD)
  2. tile binning: padded key emission + lexicographic sort + tile ranges
     (ops/tiling.py, index computation, no gradients)
  3. per-tile blend via Pallas kernels (ops/blend_pallas.py); per-key
     gradients are routed back to points with a unique-index permutation
     scatter instead of atomics.

The hand-written Jacobian chain of the reference's point-phase backward
(reference: :708-772, GaussianPoint3D.py:132-331) is replaced by jax AD
through the projection stage - analytically identical, but machine-derived.

Two entry points:
- `rasterize(...)`: differentiable via `jax.grad` (custom VJP inside).
- `rasterize_with_vjp(...)`: additionally returns an explicit vjp function
  producing parameter gradients *and* the per-point densification statistics
  the reference delivers through its backward hook (reference: :806-817,
  :1127-1142). The trainer uses this so the whole step stays in one jit.

Differentiation contract (matching the reference):
- gradients flow to point positions and all 56 features;
- no gradients to camera pose (reference: :1027,1157-1163), depth output or
  valid-count output (reference backward consumes only the image cotangent);
- density `rescale` is treated as a constant (reference: utils.py:347).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT
from . import blend_pallas as BP
from .projection import compute_point_attributes
from .tiling import bin_points_to_tiles, num_overlap_tiles
from .transforms import inverse_SE3_qt


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """Reference config (reference: :776-786) plus TPU capacity knobs."""
    near_plane: float = 0.8
    far_plane: float = 1000.0
    depth_to_sort_key_scale: float = 100.0
    rgb_only: bool = False
    grad_color_factor: float = 5.0
    grad_high_order_color_factor: float = 1.0
    grad_s_factor: float = 0.5
    grad_q_factor: float = 1.0
    grad_alpha_factor: float = 20.0
    # TPU static-shape budgets (overflow is counted, never silent):
    # tier-B slot budget for big splats, the big-point pool size, and the
    # post-sort key budget (see ops/tiling.py)
    max_tiles_per_point: int = 32
    big_point_divisor: int = 16
    mid_point_divisor: int = 4
    max_keys: int = 2 ** 21
    chunk: int = 128
    # optional tier for the log-normal size tail of real checkpoints: the
    # few splats whose bbox exceeds max_tiles_per_point tiles get
    # max_tiles_per_huge_point slots each (0 disables) in a tiny pool of
    # huge_pool_size entries (see ops/tiling.py)
    max_tiles_per_huge_point: int = 0
    huge_pool_size: int = 256
    # explicit pool ladder (overrides the divisor knobs above): ascending
    # slot sizes and matching pool capacities, normally auto-sized from a
    # workload probe (ops/capacity.py auto_capacity_config). Bounds
    # padded-slot waste below 2x at any scene scale (see ops/tiling.py)
    pool_slots: tuple = ()
    pool_caps: tuple = ()
    # blend-slab gather formulation: "row" gathers 64-byte contiguous
    # (1, 16) rows from an (N, 16) table with the transpose fused into the
    # gather; "col" is the strided (16, N)[:, idx] gather (6.6 ns/index
    # measured, the megapoint-scale bottleneck - benchmark/README round 5)
    slab_gather: str = "row"
    # tier-A compaction budget: > 0 routes 1-2-tile splats through the
    # category sort into a (2, tier_a_cap) pool tier so culled/invisible
    # points add ZERO rows to the main key sort; 0 keeps the probe-free
    # all-N layout. Auto-sized by ops/capacity.py (see ops/tiling.py)
    tier_a_cap: int = 0
    # pool-entry metadata transport: "packed" carries (min_u, min_v, dv,
    # count) + depth_q as two int32 payload operands of the category sort
    # (no gather); "gather" is the legacy 5-column packed-table gather by
    # pool id; "auto" packs whenever the tile grid's bit budget fits
    # (see ops/tiling.py)
    pool_meta: str = "auto"
    # blend-slab layout for the rgb_only inference path: "wide16" is the
    # exact (16, MK) f32 slab; "packed8" halves the gathered table to
    # (N, 8) int32 rows with colors/depth in round-to-nearest bf16 (u/v/
    # conic/logw stay exact f32, so splat shapes/alphas are bit-identical
    # and color error is bounded at 2^-9 relative - below the 1/255
    # display quantization). "auto" = packed8: it measured faster at every
    # scale (+1.3% at 430k to +40% at 2.08M, see _resolve_slab_format).
    # Training always uses the exact wide16 path regardless.
    slab_format: str = "auto"

    @property
    def tile_scan_bound(self) -> int:
        """Largest key count any single point can own - the backward's
        log-doubling segmented scan must cover it."""
        if self.pool_slots:
            return max(self.pool_slots)
        return max(self.max_tiles_per_point, self.max_tiles_per_huge_point)


class RasterizerAux(NamedTuple):
    """Non-differentiable side outputs (densification statistics and
    overflow counters)."""
    in_frustum: jnp.ndarray           # (N,) bool
    point_uv: jnp.ndarray             # (N, 2)
    point_depth: jnp.ndarray          # (N,)
    num_overlap_tiles: jnp.ndarray    # (N,) int32
    total_keys: jnp.ndarray           # () int32
    key_overflow: jnp.ndarray         # () int32
    big_point_overflow: jnp.ndarray   # () int32
    tile_cap_overflow: jnp.ndarray    # () int32
    pixel_accumulated_alpha: jnp.ndarray  # (H, W)
    nonfinite_points: jnp.ndarray = None  # () int32 culled non-finite splats


class RasterizeResult(NamedTuple):
    image: jnp.ndarray                # (H, W, 3)
    depth: jnp.ndarray                # (H, W)
    pixel_valid_point_count: jnp.ndarray  # (H, W) int32
    aux: RasterizerAux


class BackwardStats(NamedTuple):
    """Per-point statistics from the backward pass, the TPU analog of
    `BackwardValidPointHookInput` (reference: :806-817) - N-sized and masked
    instead of compacted, so everything stays on device."""
    grad_viewspace: jnp.ndarray              # (N, 2) sum of d L / d uv
    magnitude_grad_viewspace: jnp.ndarray    # (N,) sum over pixels of |duv|
    num_affected_pixels: jnp.ndarray         # (N,) int32
    magnitude_grad_viewspace_on_image: jnp.ndarray  # (H, W, 2)


class TileGrid(NamedTuple):
    """Hashable static view of the tile layout (usable in custom_vjp
    nondiff args, unlike CameraInfo which holds an array)."""
    height: int
    width: int
    tiles_per_row: int
    tiles_per_col: int

    @property
    def num_tiles(self):
        return self.tiles_per_row * self.tiles_per_col

    @staticmethod
    def from_camera(camera_info: CameraInfo) -> "TileGrid":
        return TileGrid(camera_info.camera_height, camera_info.camera_width,
                        camera_info.tiles_per_row, camera_info.tiles_per_col)


def _tiles_to_image(tile_out, grid: TileGrid):
    """(num_tiles, C, 256) -> (H, W, C) pixel-major."""
    th = grid.tiles_per_col
    tw = grid.tiles_per_row
    c = tile_out.shape[1]
    x = tile_out.reshape(th, tw, c, TILE_HEIGHT, TILE_WIDTH)
    x = x.transpose(0, 3, 1, 4, 2)
    return x.reshape(grid.height, grid.width, c)


def _image_to_tiles(image, grid: TileGrid):
    """(H, W, C) -> (num_tiles, C, 256)."""
    th = grid.tiles_per_col
    tw = grid.tiles_per_row
    c = image.shape[-1]
    x = image.reshape(th, TILE_HEIGHT, tw, TILE_WIDTH, c)
    x = x.transpose(0, 2, 4, 1, 3)
    return x.reshape(th * tw, c, TILE_HEIGHT * TILE_WIDTH)


class _BlendBinning(NamedTuple):
    point_data: jnp.ndarray          # (16, MK) blend slab (one packed gather
    #   by sorted point id inside the binning - see ops/tiling.py)
    sorted_point_idx: jnp.ndarray    # (MK,) owning point id per kept key
    sorted_valid: jnp.ndarray        # (MK,) bool
    tile_starts: jnp.ndarray
    tile_ends: jnp.ndarray
    point_kept_keys: jnp.ndarray     # (N,) kept keys per point (optimistic)
    any_dropped: jnp.ndarray         # () bool pool or key budget overflowed


def _blend_fwd_explicit(binning, grid: TileGrid, chunk):
    point_data = binning.point_data
    tile_out = BP.blend_forward(
        point_data, binning.tile_starts, binning.tile_ends,
        num_tiles=grid.num_tiles,
        tiles_per_row=grid.tiles_per_row, chunk=chunk)
    return point_data, tile_out


def _blend_bwd_explicit(point_data, tile_out, g_image, binning, grid: TileGrid,
                        n, t_b, chunk):
    """Run the Pallas backward and reduce per-key gradients to per-point.

    Scatter-free reduction (XLA scatters are ~100x slower than sorts on TPU,
    see ops/tiling.py): per-key gradients ride one unstable sort keyed by
    the owning point id, which makes every point's rows contiguous; a
    segmented shift-add scan then turns each segment's last row into the
    full per-point sum, read out with a single (N,) gather at the cumsum'd
    kept-key counts. Exact, no atomics, no scatters. This replaces the
    reference's atomic adds (reference: :675-696).

    Returns per-point cotangent columns and BackwardStats.
    """
    g_tiles = _image_to_tiles(g_image, grid)  # (T, 3, 256)
    pixel_in = jnp.concatenate(
        [g_tiles, tile_out[:, 0:3, :], jnp.zeros_like(g_tiles[:, 0:2, :])],
        axis=1)  # (T, 8, 256)
    grad_data, mag_image_tiles = BP.blend_backward(
        point_data, binning.tile_starts, binning.tile_ends, pixel_in,
        num_tiles=grid.num_tiles,
        tiles_per_row=grid.tiles_per_row, chunk=chunk)

    mk = grad_data.shape[1]
    # reorder kept-key gradients to per-point order: re-sorting the keys BY
    # OWNING POINT ID makes every point's gradient rows contiguous (padding
    # keys get a sentinel id and sort last with zero gradients).
    # carry the gradient rows through the sort as payloads: a permutation
    # gather of (16, MK) costs ~3x more than sorting the rows along (profiled
    # 58 ms gather vs ~20 ms sort); only the 11 non-zero GROW_* rows ride
    # (each extra operand costs ~0.7 ns/key on v5e)
    live_rows = (BP.GROW_DU, BP.GROW_DV, BP.GROW_DA, BP.GROW_DB, BP.GROW_DC,
                 BP.GROW_DLOGW, BP.GROW_DR, BP.GROW_DG, BP.GROW_DB_COL,
                 BP.GROW_MAG_UV, BP.GROW_NUM_PIXELS)
    row_of = {r: i for i, r in enumerate(live_rows)}
    from .tiling import INT32_MAX
    id_key = jnp.where(binning.sorted_valid, binning.sorted_point_idx,
                       INT32_MAX)
    # unstable: ties (multiple keys of one point) only permute rows within
    # a segment, which the segment sum is invariant to UP TO f32
    # reassociation - per-point gradients are backend/compile-dependent at
    # the ULP level (the reference's atomic adds have the same property;
    # exactness tests use tolerances that absorb this). A stable TPU sort
    # would pay for a hidden iota tiebreaker operand; add a cheap secondary
    # key here if bit-reproducibility is ever needed
    sorted_rows = jax.lax.sort(
        (id_key, *(grad_data[i] for i in live_rows)),
        num_keys=1, is_stable=False)
    sid = sorted_rows[0]
    grad_compact = jnp.stack(sorted_rows[1:], axis=0)    # (11, MK)
    num_live = len(live_rows)

    # segmented inclusive prefix sum via log-doubling shift-adds: a point
    # owns at most t_b keys, so ceil(log2(t_b)) masked shifts replace a
    # global (16, MK) cumsum (which profiled at ~22 ms) and make the value
    # at each segment's last row the full segment sum.
    acc = grad_compact
    shift = 1
    while shift < t_b:
        same = jnp.concatenate([
            jnp.zeros((shift,), bool),
            sid[shift:] == sid[:-shift]])                # (MK,)
        shifted = jnp.concatenate([
            jnp.zeros((num_live, shift), acc.dtype), acc[:, :-shift]], axis=1)
        acc = acc + jnp.where(same[None, :], shifted, 0.0)
        shift *= 2

    # per-point segment ends: when nothing was dropped the kept counts are
    # exact and ends are a plain running sum; the overflow fallback does an
    # exact merge-sort search over the sorted ids
    point_arange = jnp.arange(n, dtype=jnp.int32)
    seg_end = jax.lax.cond(
        binning.any_dropped,
        lambda: jnp.searchsorted(sid, point_arange, side="right",
                                 method="sort").astype(jnp.int32),
        lambda: jnp.cumsum(binning.point_kept_keys))
    seg_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), seg_end[:-1]])
    hi = acc[:, jnp.clip(seg_end - 1, 0, mk - 1)]
    per_point = jnp.where((seg_end > seg_start)[None, :], hi,
                          0.0)                           # (num_live, N)

    cotangents = tuple(per_point[row_of[r]] for r in (
        BP.GROW_DU, BP.GROW_DV, BP.GROW_DA, BP.GROW_DB, BP.GROW_DC,
        BP.GROW_DLOGW, BP.GROW_DR, BP.GROW_DG, BP.GROW_DB_COL))
    stats = BackwardStats(
        grad_viewspace=jnp.stack(
            [per_point[row_of[BP.GROW_DU]], per_point[row_of[BP.GROW_DV]]],
            axis=-1),
        magnitude_grad_viewspace=per_point[row_of[BP.GROW_MAG_UV]],
        num_affected_pixels=per_point[
            row_of[BP.GROW_NUM_PIXELS]].astype(jnp.int32),
        magnitude_grad_viewspace_on_image=_tiles_to_image(
            mag_image_tiles, grid)[:, :, 0:2],
    )
    return cotangents, stats


def _float0_zeros(x):
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# custom_vjp wrapper so plain jax.grad works through the Pallas blend
# static_cfg = (camera_info, chunk, t_cap, n)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend_core(static_cfg, cols, depth, blend_binning):
    """The blend's primal computes from the slab inside `blend_binning` (the
    sorted gather of `cols`/`depth`); `cols` and `depth` are the formal
    differentiable inputs the hand-written VJP returns cotangents for."""
    out, _ = _blend_core_fwd(static_cfg, cols, depth, blend_binning)
    return out


def _blend_core_fwd(static_cfg, cols, depth, blend_binning):
    grid, chunk, n, t_b = static_cfg
    binning = _BlendBinning(*blend_binning)
    point_data, tile_out = _blend_fwd_explicit(binning, grid, chunk)
    residuals = (point_data, tile_out, blend_binning)
    return tile_out, residuals


def _blend_core_bwd(static_cfg, residuals, g_tile_out):
    grid, chunk, n, t_b = static_cfg
    point_data, tile_out, blend_binning = residuals
    binning = _BlendBinning(*blend_binning)
    # only the rgb rows of the tile output carry gradient
    g_image = _tiles_to_image(g_tile_out[:, 0:3, :], grid)
    cotangents, _ = _blend_bwd_explicit(
        point_data, tile_out, g_image, binning, grid, n, t_b, chunk)
    return (cotangents,
            jnp.zeros_like(cotangents[0]),          # depth: no grad
            jax.tree.map(_float0_zeros, blend_binning))


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _resolve_slab_format(config, n: int) -> str:
    """The rgb_only blend-slab layout: "auto" = packed8 - it measured
    faster at EVERY scale (v5e, /tmp/r5_queue8: 430k 78.83 vs 77.84 FPS,
    1.03M 34.05 vs 31.98, 2.08M 19.32 vs 13.76; the slab gather's
    per-index cost cliffs with table size, and even below the cliff the
    halved table + halved blend DMA bytes win). The bf16 color/depth
    rounding (relative 2^-9) stays below the 1/255 display quantization;
    pass slab_format="wide16" for the exact f32 inference path."""
    if config.slab_format == "auto":
        return "packed8"
    if config.slab_format not in ("wide16", "packed8"):
        raise ValueError(f"slab_format must be auto|wide16|packed8, "
                         f"got {config.slab_format!r}")
    return config.slab_format


def _project_and_bin(pointcloud, pointcloud_features, point_invalid_mask,
                     point_object_id, q_pointcloud_camera,
                     t_pointcloud_camera, camera_info, config, color_sh_mask,
                     object_edit=None, slab_format="wide16"):
    q_cam, t_cam = inverse_SE3_qt(q_pointcloud_camera, t_pointcloud_camera)
    attrs = compute_point_attributes(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        q_cam, t_cam, t_pointcloud_camera, camera_info,
        config.near_plane, config.far_plane, color_sh_mask,
        object_edit=object_edit)
    cols, depth = _blend_inputs_from_attrs(attrs)
    binning = bin_points_to_tiles(
        attrs.u, attrs.v, attrs.depth, attrs.radius_x, attrs.radius_y,
        attrs.emit, camera_info,
        depth_to_sort_key_scale=config.depth_to_sort_key_scale,
        max_tiles_per_point=config.max_tiles_per_point,
        big_point_divisor=config.big_point_divisor,
        mid_point_divisor=config.mid_point_divisor,
        max_keys=config.max_keys,
        chunk=config.chunk,
        attr_cols=cols + (depth,),
        max_tiles_per_huge_point=config.max_tiles_per_huge_point,
        huge_pool_size=config.huge_pool_size,
        pool_slots=config.pool_slots,
        pool_caps=config.pool_caps,
        slab_gather=config.slab_gather,
        tier_a_cap=config.tier_a_cap,
        pool_meta=config.pool_meta,
        slab_format=slab_format)
    return attrs, cols, depth, binning


def _blend_inputs_from_attrs(attrs):
    """Split attributes into the blend's differentiable input columns.

    rescale enters log-space with gradient blocked (reference: utils.py:347);
    the alpha-logit chain flows through log(sigmoid(alpha)).
    """
    rescale_log = jax.lax.stop_gradient(
        jnp.log(jnp.maximum(attrs.rescale, 1e-30)))
    logw = rescale_log + jnp.log(
        jnp.maximum(attrs.alpha_after_activation, 1e-30))
    cols = (attrs.u, attrs.v, attrs.conic_a, attrs.conic_b, attrs.conic_c,
            logw, attrs.color_r, attrs.color_g, attrs.color_b)
    return cols, jax.lax.stop_gradient(attrs.depth)


def _result_from_tile_out(tile_out, attrs, binning, camera_info,
                          rgb_only=False):
    grid = TileGrid.from_camera(camera_info)
    if rgb_only:
        # the rgb kernel leaves the depth/count bookkeeping channels
        # unwritten (reference rgb_only semantics); transpose only the 4
        # meaningful channels - the (T, C, 256) -> (H, W, C) layout change
        # is minor-dim-hostile on TPU and costs ~0.05 ms per channel at
        # 976x544 (xprof, rasterizer reshape/copy rows), so moving the 4
        # junk channels was pure waste
        pix = _tiles_to_image(tile_out[:, 0:BP.OUT_ACC_ALPHA + 1, :], grid)
        image = pix[:, :, 0:3]
        acc_alpha = jax.lax.stop_gradient(pix[:, :, BP.OUT_ACC_ALPHA])
        depth = jnp.zeros_like(acc_alpha)
        count = jnp.zeros(acc_alpha.shape, jnp.int32)
    else:
        pix = _tiles_to_image(tile_out, grid)  # (H, W, 8)
        image = pix[:, :, 0:3]
        depth = jax.lax.stop_gradient(pix[:, :, BP.OUT_DEPTH])
        count = jax.lax.stop_gradient(
            pix[:, :, BP.OUT_COUNT]).astype(jnp.int32)
        acc_alpha = jax.lax.stop_gradient(pix[:, :, BP.OUT_ACC_ALPHA])
    aux = RasterizerAux(
        in_frustum=attrs.in_frustum,
        point_uv=jax.lax.stop_gradient(attrs.uv),
        point_depth=jax.lax.stop_gradient(attrs.depth),
        num_overlap_tiles=jax.lax.stop_gradient(num_overlap_tiles(
            attrs.u, attrs.v, attrs.radius_x, attrs.radius_y,
            attrs.emit, camera_info)),
        total_keys=binning.total_keys,
        key_overflow=binning.key_overflow,
        big_point_overflow=binning.big_point_overflow,
        tile_cap_overflow=binning.tile_cap_overflow,
        pixel_accumulated_alpha=acc_alpha,
        nonfinite_points=attrs.nonfinite_points,
    )
    return RasterizeResult(image=image, depth=depth,
                           pixel_valid_point_count=count, aux=aux)


def rasterize(
    pointcloud: jnp.ndarray,           # (N, 3)
    pointcloud_features: jnp.ndarray,  # (N, 56)
    point_invalid_mask: jnp.ndarray,   # (N,)
    point_object_id: jnp.ndarray,      # (N,) int32
    q_pointcloud_camera: jnp.ndarray,  # (K, 4)
    t_pointcloud_camera: jnp.ndarray,  # (K, 3)
    camera_info: CameraInfo,
    config: RasterizerConfig,
    color_sh_mask=None,                # optional (16,) band curriculum mask
    object_edit=None,                  # optional (q (K,4), s (K,3), t (K,3))
    #   per-object scene-editing transform (see ops/projection.py)
) -> RasterizeResult:
    """Render one view. Differentiable wrt pointcloud and features via
    jax.grad (equivalent of reference forward, :1184-1204)."""
    camera_info.validate()
    n = pointcloud.shape[0]
    # the packed8 slab only exists on the rgb_only inference path; the
    # differentiable path always builds the exact wide16 slab
    slab_format = _resolve_slab_format(config, n)
    if not config.rgb_only:
        slab_format = "wide16"
    attrs, cols, depth, binning = _project_and_bin(
        pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
        q_pointcloud_camera, t_pointcloud_camera, camera_info, config,
        color_sh_mask, object_edit=object_edit, slab_format=slab_format)
    static_cfg = (TileGrid.from_camera(camera_info), config.chunk, n,
                  config.tile_scan_bound)
    blend_binning = _BlendBinning(
        binning.point_data, binning.sorted_point_idx, binning.sorted_valid,
        binning.tile_starts, binning.tile_ends, binning.point_kept_keys,
        (binning.big_point_overflow + binning.key_overflow) > 0)
    if config.rgb_only:
        # inference fast path (reference rgb_only template flag,
        # reference: GaussianPointCloudRasterisation.py:342,409,464):
        # no VJP machinery, no gradient routing metadata, lean kernel that
        # skips the depth/count/last-effective bookkeeping
        grid = TileGrid.from_camera(camera_info)
        tile_out = BP.blend_forward_rgb(
            binning.point_data, blend_binning.tile_starts,
            blend_binning.tile_ends,
            num_tiles=grid.num_tiles, tiles_per_row=grid.tiles_per_row,
            chunk=config.chunk)
    else:
        tile_out = _blend_core(static_cfg, cols, depth,
                               tuple(blend_binning))
    return _result_from_tile_out(tile_out, attrs, binning, camera_info)


def rasterize_with_vjp(
    pointcloud, pointcloud_features, point_invalid_mask, point_object_id,
    q_pointcloud_camera, t_pointcloud_camera, camera_info, config,
    color_sh_mask=None,
) -> Tuple[RasterizeResult, Callable]:
    """Like `rasterize`, but also returns `vjp_fn(g_image) ->
    (grad_pointcloud, grad_pointcloud_features, BackwardStats)`.

    The returned gradients are raw - per-group gradient scaling and SH-band
    masking (reference: :1102-1125) are applied by the caller (trainer).
    """
    camera_info.validate()
    if config.rgb_only:
        # the full (non-rgb_only) forward kernel outputs are needed
        config = dataclasses.replace(config, rgb_only=False)
    n = pointcloud.shape[0]

    def attr_fn(pc, feats):
        attrs, cols, depth, binning = _project_and_bin(
            pc, feats, point_invalid_mask, point_object_id,
            q_pointcloud_camera, t_pointcloud_camera, camera_info, config,
            color_sh_mask)
        return cols, (attrs, binning, depth)

    cols, attr_vjp, (attrs, binning, depth) = jax.vjp(
        attr_fn, pointcloud, pointcloud_features, has_aux=True)

    grid = TileGrid.from_camera(camera_info)
    blend_binning = _BlendBinning(
        binning.point_data, binning.sorted_point_idx, binning.sorted_valid,
        binning.tile_starts, binning.tile_ends, binning.point_kept_keys,
        (binning.big_point_overflow + binning.key_overflow) > 0)
    point_data, tile_out = _blend_fwd_explicit(
        blend_binning, grid, config.chunk)
    result = _result_from_tile_out(tile_out, attrs, binning, camera_info)

    def vjp_fn(g_image):
        cotangents, stats = _blend_bwd_explicit(
            point_data, tile_out, g_image, blend_binning, grid, n,
            config.tile_scan_bound, config.chunk)
        grad_pc, grad_feats = attr_vjp(cotangents)
        return grad_pc, grad_feats, stats

    return result, vjp_fn
