"""Adaptive density controller, fully on-device.

Functional rebuild of `GaussianPointAdaptiveController`
(reference: GaussianPointAdaptiveController.py). The reference's fixed-pool
design (invalid-mask slots reused for new points, reference: :47-52) is kept
verbatim - it is exactly the static-shape discipline XLA wants - but the
host-side boolean indexing / compaction (reference: :290-353) becomes masked
rank-matching scatters, and the unseeded Taichi RNG for split sampling
(reference: GaussianPoint3D.py:390-406) becomes explicit jax PRNG keys.

Timeline semantics preserved from the reference:
- statistics accumulate every backward pass (`update`, reference: :130-146)
- every `num_iterations_densify` steps after warm-up, candidates are chosen
  from the *pre-optimizer* state of the trigger step and inserted after the
  optimizer step (`_find_densify_points` + `_add_densify_points`)
- alpha logits are clamped down every `num_iterations_reset_alpha` steps
  (reference: :355-358)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.scene import GaussianPointCloudScene
from ..ops import gaussian as G
from ..ops.rasterizer import BackwardStats


@dataclasses.dataclass
class AdaptiveControllerConfig:
    """reference: GaussianPointAdaptiveController.py:53-84."""
    num_iterations_warm_up: int = 500
    num_iterations_densify: int = 100
    transparent_alpha_threshold: float = -0.5
    densification_view_space_position_gradients_threshold: float = 6e-6
    densification_view_avg_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_view_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_view_pixel_avg_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_position_gradients_threshold: float = 1e3
    gaussian_split_factor_phi: float = 1.6
    num_iterations_reset_alpha: int = 3000
    reset_alpha_value: float = 0.1
    floater_num_pixels_threshold: int = 10000
    floater_near_camrea_num_pixels_threshold: int = 10000  # sic, reference typo
    floater_depth_threshold: float = 100.0
    iteration_start_remove_floater: int = 2000
    plot_densify_interval: int = 200
    under_reconstructed_num_pixels_threshold: int = 512
    under_reconstructed_move_factor: float = 100.0
    enable_ellipsoid_offset: bool = False
    enable_sample_from_point: bool = True


class ControllerState(NamedTuple):
    """Per-point accumulators (reference: :114-125)."""
    accumulated_num_pixels: jnp.ndarray          # (N,) int32
    accumulated_num_in_camera: jnp.ndarray       # (N,) int32
    accumulated_view_space_grad: jnp.ndarray     # (N,) f32
    accumulated_view_space_grad_avg: jnp.ndarray  # (N,) f32
    accumulated_position_grad: jnp.ndarray       # (N, 3) f32
    accumulated_position_grad_norm: jnp.ndarray  # (N,) f32

    @staticmethod
    def zeros(n: int) -> "ControllerState":
        return ControllerState(
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )


class DensifyCounts(NamedTuple):
    """What the reference prints per densify (reference: :226,245,319,351),
    plus the per-point masks its debug scatter plots (reference: :267-283);
    the trainer renders them at `plot_densify_interval` cadence."""
    num_transparent: jnp.ndarray
    num_floaters: jnp.ndarray
    num_candidates: jnp.ndarray
    num_fillable: jnp.ndarray
    num_over_reconstructed: jnp.ndarray
    num_valid_after: jnp.ndarray
    floater_mask: jnp.ndarray = None            # (N,) bool
    over_reconstructed_mask: jnp.ndarray = None  # (N,) bool (densify & over)
    under_reconstructed_mask: jnp.ndarray = None  # (N,) bool


def update_stats(state: ControllerState, stats: BackwardStats,
                 grad_pointcloud: jnp.ndarray,
                 in_frustum: jnp.ndarray) -> ControllerState:
    """Per-step accumulation (reference: :130-141), masked instead of
    index-compacted."""
    seen = in_frustum.astype(jnp.int32)
    seen_f = in_frustum.astype(jnp.float32)
    npix = stats.num_affected_pixels
    mag = stats.magnitude_grad_viewspace * seen_f
    avg = jnp.where(npix > 0, mag / npix.astype(jnp.float32), 0.0)
    gpos = grad_pointcloud * seen_f[:, None]
    return ControllerState(
        accumulated_num_pixels=state.accumulated_num_pixels + npix * seen,
        accumulated_num_in_camera=state.accumulated_num_in_camera + seen,
        accumulated_view_space_grad=state.accumulated_view_space_grad + mag,
        accumulated_view_space_grad_avg=(state.accumulated_view_space_grad_avg
                                         + avg),
        accumulated_position_grad=state.accumulated_position_grad + gpos,
        accumulated_position_grad_norm=(
            state.accumulated_position_grad_norm
            + jnp.linalg.norm(gpos, axis=1)),
    )


def _rank_assignment(dst_mask, src_mask, n):
    """For each destination slot (dst_mask), the index of the source with the
    same rank, or -1. Static-shape replacement for the reference's
    `torch.where(invalid)[0][:num_candidates]` fill (reference: :299-312)."""
    src_rank = jnp.cumsum(src_mask.astype(jnp.int32)) - 1      # (N,)
    dst_rank = jnp.cumsum(dst_mask.astype(jnp.int32)) - 1
    num_src = jnp.sum(src_mask.astype(jnp.int32))
    # src index by rank
    scatter_idx = jnp.where(src_mask, src_rank, n)
    src_by_rank = jnp.full((n,), -1, jnp.int32).at[scatter_idx].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    src_for_dst = jnp.where(
        dst_mask & (dst_rank < num_src), src_by_rank[jnp.clip(dst_rank, 0, n - 1)],
        -1)
    return src_for_dst


def densify_step(
    scene: GaussianPointCloudScene,
    state: ControllerState,
    stats: BackwardStats,
    in_frustum: jnp.ndarray,        # (N,) of the trigger step
    point_depth: jnp.ndarray,       # (N,) camera depth of the trigger step
    position_before_optimizer: jnp.ndarray,  # (N, 3)
    iteration: jnp.ndarray,         # () int32
    key: jax.Array,
    config: AdaptiveControllerConfig,
) -> Tuple[GaussianPointCloudScene, ControllerState, DensifyCounts]:
    """One densify/prune round. Pure function; jit-able.

    Mirrors `_find_densify_points` (reference: :170-283) and
    `_add_densify_points` (reference: :290-353).
    """
    n = scene.capacity
    pc = scene.point_cloud
    feats = scene.point_cloud_features
    invalid = scene.point_invalid_mask
    valid = invalid == 0

    npix_frame = stats.num_affected_pixels
    mag_frame = stats.magnitude_grad_viewspace

    # ---- removal masks -------------------------------------------------
    floater_mask = (in_frustum
                    & (npix_frame > config.floater_near_camrea_num_pixels_threshold)
                    & (point_depth < config.floater_depth_threshold)
                    & valid)
    floater_mask &= iteration > config.iteration_start_remove_floater

    alpha = feats[:, 7]
    nan_mask = jnp.isnan(feats).any(axis=1)
    transparent_mask = (((alpha < config.transparent_alpha_threshold) | nan_mask)
                        & valid & (~floater_mask))
    remove_mask = floater_mask | transparent_mask

    # ---- densify candidate masks ---------------------------------------
    npix_f = npix_frame.astype(jnp.float32)
    single_frame = (mag_frame
                    > config.densification_view_space_position_gradients_threshold)
    single_frame |= jnp.where(
        npix_f > 0, mag_frame / jnp.maximum(npix_f, 1.0), 0.0
    ) > config.densification_view_avg_space_position_gradients_threshold
    single_frame &= in_frustum & (~remove_mask)

    seen = state.accumulated_num_in_camera.astype(jnp.float32)
    safe_seen = jnp.maximum(seen, 1.0)
    multi_view = jnp.where(seen > 0,
                           state.accumulated_view_space_grad / safe_seen, 0.0)
    multi_frame = (multi_view
                   > config.densification_multi_frame_view_space_position_gradients_threshold)
    avg_pixels = jnp.where(seen > 0,
                           state.accumulated_num_pixels.astype(jnp.float32)
                           / safe_seen, 0.0)
    multi_avg = jnp.where(seen > 0,
                          state.accumulated_view_space_grad_avg / safe_seen, 0.0)
    multi_frame |= jnp.where(
        avg_pixels > 0, multi_avg / jnp.maximum(avg_pixels, 1e-12), 0.0
    ) > config.densification_multi_frame_view_pixel_avg_space_position_gradients_threshold
    multi_frame |= jnp.where(
        seen > 0, state.accumulated_position_grad_norm / safe_seen, 0.0
    ) > config.densification_multi_frame_position_gradients_threshold

    densify_mask = (single_frame | multi_frame) & (~remove_mask) & valid

    grad_position = jnp.where(
        seen[:, None] > 0,
        state.accumulated_position_grad / safe_seen[:, None], 0.0)

    over_reconstructed = (state.accumulated_num_pixels
                          > config.under_reconstructed_num_pixels_threshold)
    size_reduction = jnp.where(
        densify_mask & over_reconstructed,
        jnp.log(config.gaussian_split_factor_phi), 0.0)  # (N,)

    # ---- apply removals -------------------------------------------------
    invalid = jnp.where(remove_mask, jnp.int8(1), invalid)

    # ---- assign candidates to invalid slots ------------------------------
    slot_mask = invalid == 1
    src_for_dst = _rank_assignment(slot_mask, densify_mask, n)  # (N,)
    filled = src_for_dst >= 0
    src = jnp.clip(src_for_dst, 0, n - 1)
    # which candidates actually got a slot (num_fillable truncation)
    fillable_src_mask = jnp.zeros((n,), bool).at[
        jnp.where(filled, src, n)].set(True, mode="drop")

    # new point: position before optimizer of the source candidate
    # (reference: :307-308)
    new_pc = jnp.where(filled[:, None], position_before_optimizer[src], pc)
    new_feats = jnp.where(filled[:, None], feats[src], feats)
    new_obj = jnp.where(filled, scene.point_object_id[src],
                        scene.point_object_id)

    # size reduction on both copies (reference: :313-322); only candidates
    # that actually got a slot shrink (num_fillable truncation)
    red_src = size_reduction[src]
    new_feats = new_feats.at[:, 4:7].add(
        jnp.where(filled, -red_src, 0.0)[:, None])
    new_feats = new_feats.at[:, 4:7].add(
        jnp.where(fillable_src_mask, -size_reduction, 0.0)[:, None])

    split_dst = filled & (red_src > 1e-6)
    clone_dst = filled & (red_src <= 1e-6)
    if config.enable_sample_from_point:
        # split: resample both copies from the shrunken gaussian, each with
        # its own random draw (reference: :329-341). The new copy samples
        # around the source's current (post-optimizer) position; the
        # original samples around its own position.
        key_new, key_old = jax.random.split(key)
        dst_samples = G.sample_from_gaussian(
            key_new, pc[src], new_feats[:, 0:4], new_feats[:, 4:7])
        new_pc = jnp.where(split_dst[:, None], dst_samples, new_pc)
        split_src = fillable_src_mask & (size_reduction > 1e-6)
        src_samples = G.sample_from_gaussian(
            key_old, new_pc, new_feats[:, 0:4], new_feats[:, 4:7])
        new_pc = jnp.where(split_src[:, None], src_samples, new_pc)
        # clone: nudge the new copy along the accumulated gradient
        # (reference: :342-345)
        new_pc = new_pc + jnp.where(
            clone_dst[:, None],
            grad_position[src] * config.under_reconstructed_move_factor, 0.0)

    if config.enable_ellipsoid_offset:
        offset = G.ellipsoid_foci_vector(new_feats[:, 0:4], new_feats[:, 4:7])
        new_pc = new_pc + jnp.where(filled[:, None], offset, 0.0)
        new_pc = new_pc - jnp.where(fillable_src_mask[:, None], offset, 0.0)

    invalid = jnp.where(filled, jnp.int8(0), invalid)

    counts = DensifyCounts(
        num_transparent=jnp.sum(transparent_mask.astype(jnp.int32)),
        num_floaters=jnp.sum(floater_mask.astype(jnp.int32)),
        num_candidates=jnp.sum(densify_mask.astype(jnp.int32)),
        num_fillable=jnp.sum(filled.astype(jnp.int32)),
        num_over_reconstructed=jnp.sum(split_dst.astype(jnp.int32)),
        num_valid_after=jnp.sum((invalid == 0).astype(jnp.int32)),
        floater_mask=floater_mask,
        over_reconstructed_mask=densify_mask & over_reconstructed,
        under_reconstructed_mask=densify_mask & (~over_reconstructed),
    )

    new_scene = GaussianPointCloudScene(
        point_cloud=new_pc,
        point_cloud_features=new_feats,
        point_invalid_mask=invalid,
        point_object_id=new_obj,
    )
    return new_scene, ControllerState.zeros(n), counts


def reset_alpha(scene: GaussianPointCloudScene,
                config: AdaptiveControllerConfig) -> GaussianPointCloudScene:
    """Clamp alpha logits from above (reference: :355-358)."""
    feats = scene.point_cloud_features
    feats = feats.at[:, 7].set(
        jnp.minimum(feats[:, 7], config.reset_alpha_value))
    return scene._replace(point_cloud_features=feats)
