"""Slow-but-exact alpha blending oracle in pure jnp (differentiable).

A direct transcription of the reference's forward blend loop
(reference: GaussianPointCloudRasterisation.py:318-485) as a `lax.scan` over
the sorted key list, vectorized over pixels. It exists as the correctness and
gradient oracle for the Pallas production kernels (the reference never had an
independent oracle for the blend; its tests only checked single-point chains,
reference: tests/GaussianPointCloudRasterisation_test.py:353-548).

Semantics reproduced exactly:
- per-point pixel density from conic with low-pass rescale, evaluated at
  pixel centers (+0.5) (reference: :441-445, utils.py:276-284)
- skip blending when alpha < 1/255 (reference: :451)
- clamp alpha at 0.99 *with gradient passing through the clamp*, matching the
  reference backward which ignores the clamp derivative (reference: :453,
  :658-662)
- stop before transmittance would drop below 1e-4; the saturating point does
  not contribute (reference: :457-460)
- alpha-weighted depth normalized by max(weight, 1e-6) (reference: :479-480)

Complexity is O(num_pixels * num_keys); use only for tests / tiny scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT

from .gaussian import ALPHA_SKIP_THRESHOLD  # noqa: F401 (canonical constant)
ALPHA_CLAMP = 0.99
TRANSMITTANCE_SATURATION = 1e-4


class BlendOutputs(NamedTuple):
    image: jnp.ndarray                 # (H, W, 3)
    depth: jnp.ndarray                 # (H, W)
    accumulated_alpha: jnp.ndarray     # (H, W) = 1 - T
    last_effective_offset: jnp.ndarray  # (H, W) int32, global key idx + 1
    valid_point_count: jnp.ndarray     # (H, W) int32


def straight_through_clamp(a, max_value=ALPHA_CLAMP):
    """min(a, max_value) in value, identity in gradient (reference backward
    ignores the clamp derivative, GaussianPointCloudRasterisation.py:658-662)."""
    return a + jax.lax.stop_gradient(jnp.minimum(a, max_value) - a)


def pixel_grid(camera_info: CameraInfo):
    """Returns flat (HW,) pixel center coords and tile ids (row-major)."""
    h, w = camera_info.camera_height, camera_info.camera_width
    vs, us = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    px = us.reshape(-1).astype(jnp.float32) + 0.5
    py = vs.reshape(-1).astype(jnp.float32) + 0.5
    tiles_x = w // TILE_WIDTH
    tile = (vs // TILE_HEIGHT) * tiles_x + (us // TILE_WIDTH)
    return px, py, tile.reshape(-1).astype(jnp.int32)


def blend_reference(
    sorted_point_idx: jnp.ndarray,   # (K,) int32 into point arrays
    sorted_tile_id: jnp.ndarray,     # (K,) int32; >= num_tiles means padding
    sorted_valid: jnp.ndarray,       # (K,) bool
    point_uv: jnp.ndarray,           # (N, 2)
    point_conic_and_rescale: jnp.ndarray,  # (N, 4)
    point_alpha_after_activation: jnp.ndarray,  # (N,)
    point_color: jnp.ndarray,        # (N, 3)
    point_depth: jnp.ndarray,        # (N,)
    camera_info: CameraInfo,
) -> BlendOutputs:
    h, w = camera_info.camera_height, camera_info.camera_width
    px, py, pixel_tile = pixel_grid(camera_info)
    hw = px.shape[0]

    def step(carry, key_j):
        T, color, depth_acc, depth_norm, count, last_eff, saturated = carry
        j, pt, tile, valid = key_j
        uv = point_uv[pt]
        conic = point_conic_and_rescale[pt]
        dx = px - uv[0]
        dy = py - uv[1]
        exponent = (-0.5 * (dx * dx * conic[0] + dy * dy * conic[2])
                    - dx * dy * conic[1])
        a = jnp.exp(exponent) * conic[3] * point_alpha_after_activation[pt]
        mask = valid & (tile == pixel_tile)
        a = jnp.where(mask, a, 0.0)
        a = jnp.where(a < ALPHA_SKIP_THRESHOLD, 0.0, a)
        a = straight_through_clamp(a)
        next_T = T * (1.0 - a)
        sat_trigger = (a > 0.0) & (next_T < TRANSMITTANCE_SATURATION)
        contribute = (a > 0.0) & (~saturated) & (~sat_trigger)
        weight = jnp.where(contribute, a * T, 0.0)
        color = color + weight[:, None] * point_color[pt][None, :]
        depth_acc = depth_acc + weight * point_depth[pt]
        depth_norm = depth_norm + weight
        count = count + contribute.astype(jnp.int32)
        last_eff = jnp.where(contribute, j + 1, last_eff)
        T = jnp.where(contribute, next_T, T)
        saturated = saturated | sat_trigger
        return (T, color, depth_acc, depth_norm, count, last_eff, saturated), None

    k = sorted_point_idx.shape[0]
    init = (
        jnp.ones((hw,), jnp.float32),
        jnp.zeros((hw, 3), jnp.float32),
        jnp.zeros((hw,), jnp.float32),
        jnp.zeros((hw,), jnp.float32),
        jnp.zeros((hw,), jnp.int32),
        jnp.zeros((hw,), jnp.int32),
        jnp.zeros((hw,), bool),
    )
    keys = (jnp.arange(k, dtype=jnp.int32), sorted_point_idx,
            sorted_tile_id, sorted_valid)
    (T, color, depth_acc, depth_norm, count, last_eff, _), _ = jax.lax.scan(
        step, init, keys)

    image = color.reshape(h, w, 3)
    depth = (depth_acc / jnp.maximum(depth_norm, 1e-6)).reshape(h, w)
    acc_alpha = (1.0 - T).reshape(h, w)
    return BlendOutputs(
        image=image,
        depth=depth,
        accumulated_alpha=acc_alpha,
        last_effective_offset=last_eff.reshape(h, w),
        valid_point_count=count.reshape(h, w),
    )
