"""Point-parallel attribute pipeline: 3D Gaussians -> per-point 2D attributes.

TPU-native fusion of the reference's first three kernels into one batched,
differentiable jnp stage operating on the full fixed-capacity point pool:
- `filter_point_in_camera` (reference: GaussianPointCloudRasterisation.py:31-78)
- `generate_point_attributes_in_camera_plane` (reference: :239-315)

Instead of compacting visible points to a dynamic-size list with boolean
indexing (reference: :861-870), we keep everything N-sized and carry an
`in_frustum` mask: XLA requires static shapes, and the per-point math is cheap
enough that masked lanes cost less than a host round-trip for compaction.

Gradient semantics for the stored quaternion follow the reference: the
quaternion is normalized on read, gradients are computed with respect to the
*normalized* value (the reference normalizes the parameter tensor in place
during forward, reference: :197-205,264, then differentiates treating it as
unit-norm). We reproduce this with a straight-through normalization plus
explicit parameter renormalization in the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT, BOUNDARY_TILES
from . import gaussian as G
from . import sh
from .transforms import (
    transform_matrix_from_quaternion_and_translation,
    quaternion_normalize,
)


class PointAttributes(NamedTuple):
    """Per-point 2D attributes, all N-sized (invalid lanes masked)."""
    uv: jnp.ndarray                 # (N, 2)
    xyz_camera: jnp.ndarray         # (N, 3)
    conic_and_rescale: jnp.ndarray  # (N, 4) a, b, c, rescale
    alpha_after_activation: jnp.ndarray  # (N,) sigmoid(alpha logit)
    color: jnp.ndarray              # (N, 3) sigmoid(SH eval)
    radii: jnp.ndarray              # (N,)
    in_frustum: jnp.ndarray         # (N,) bool


def normalize_straight_through(q):
    """Value = q/|q|, jacobian = diag(1/|q|) (identity when already unit).

    Matches the reference's grad-wrt-normalized-quaternion shortcut
    (reference: GaussianPointCloudRasterisation.py:197-205 +
    GaussianPoint3D.py:237-331 which assume unit q).
    """
    inv_norm = jax.lax.stop_gradient(
        1.0 / jnp.linalg.norm(q, axis=-1, keepdims=True))
    return q * inv_norm


def compute_point_attributes(
    pointcloud: jnp.ndarray,          # (N, 3)
    pointcloud_features: jnp.ndarray,  # (N, 56)
    point_invalid_mask: jnp.ndarray,  # (N,) int8/bool; 1 = invalid
    point_object_id: jnp.ndarray,     # (N,) int32 in [0, K)
    q_camera_pointcloud: jnp.ndarray,  # (K, 4)
    t_camera_pointcloud: jnp.ndarray,  # (K, 3)
    t_pointcloud_camera: jnp.ndarray,  # (K, 3) ray origins per object
    camera_info: CameraInfo,
    near_plane: float,
    far_plane: float,
    color_sh_mask=None,               # optional (16,) band curriculum mask
) -> PointAttributes:
    intrinsics = jnp.asarray(camera_info.camera_intrinsics, jnp.float32)
    T_camera_world_per_obj = transform_matrix_from_quaternion_and_translation(
        quaternion_normalize(q_camera_pointcloud), t_camera_pointcloud)  # (K,4,4)
    T_camera_world = T_camera_world_per_obj[point_object_id]  # (N,4,4)
    ray_origin = t_pointcloud_camera[point_object_id]         # (N,3)

    q = normalize_straight_through(pointcloud_features[:, G.FEATURE_Q])
    log_s = pointcloud_features[:, G.FEATURE_S]
    alpha_logit = pointcloud_features[:, G.FEATURE_ALPHA]

    uv, xyz_cam = G.project_points(pointcloud, T_camera_world, intrinsics)
    cov_uv = G.project_covariance(q, log_s, T_camera_world, intrinsics, xyz_cam)
    conic = G.conic_and_rescale(cov_uv)
    radii = G.point_radii(cov_uv)
    alpha_act = jax.nn.sigmoid(alpha_logit)

    # SH color along camera->point ray; direction left unnormalized here, the
    # basis normalizes internally (reference: :302-308, GaussianPoint3D.py:333-349)
    direction = pointcloud - ray_origin
    basis = sh.sh_basis_from_direction(direction)  # (N, 16)
    if color_sh_mask is not None:
        basis = basis * color_sh_mask
    r = jnp.sum(pointcloud_features[:, G.FEATURE_R_SH] * basis, axis=-1)
    g = jnp.sum(pointcloud_features[:, G.FEATURE_G_SH] * basis, axis=-1)
    b = jnp.sum(pointcloud_features[:, G.FEATURE_B_SH] * basis, axis=-1)
    color = jax.nn.sigmoid(jnp.stack([r, g, b], axis=-1))

    # Frustum test (reference: :72-78): strict near/far, uv within a
    # 3-tile boundary around the image.
    depth = xyz_cam[..., 2]
    bw = TILE_WIDTH * BOUNDARY_TILES
    bh = TILE_HEIGHT * BOUNDARY_TILES
    in_frustum = ((depth > near_plane) & (depth < far_plane)
                  & (uv[..., 0] >= -bw)
                  & (uv[..., 0] < camera_info.camera_width + bw)
                  & (uv[..., 1] >= -bh)
                  & (uv[..., 1] < camera_info.camera_height + bh)
                  & (point_invalid_mask.astype(jnp.int32) == 0))

    return PointAttributes(
        uv=uv,
        xyz_camera=xyz_cam,
        conic_and_rescale=conic,
        alpha_after_activation=alpha_act,
        color=color,
        radii=radii,
        in_frustum=in_frustum,
    )
