"""Auxiliary device geometry: ray/ellipsoid intersection, point-to-line,
per-pixel ray generation.

Batched jnp rebuilds of the reference's remaining L0 device functions
(reference: utils.py:12-108, 111-197). The reference uses these in tests and
exposes them for experimentation (e.g. the SH-query-point TODO at
GaussianPoint3D.py:341); they are part of the public math surface.
"""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import inverse_SE3
from ..camera import CameraInfo


def intersect_ray_with_ellipsoid(ray_origin, ray_direction, ellipsoid_R,
                                 ellipsoid_t, ellipsoid_S, eps: float = 1e-5):
    """Ray vs ellipsoid (R rotation, t center, S axis scales).

    Returns (has_intersection (...,) bool, intersection_point (..., 3)).
    Matches the reference's algorithm incl. its eps clamps and the
    min-root selection for grazing hits (reference: utils.py:12-82).
    """
    o = ray_origin - ellipsoid_t
    # transform into the unit-sphere frame: S^-1 R^T x
    RT_o = jnp.einsum("...ji,...j->...i", ellipsoid_R, o)
    RT_d = jnp.einsum("...ji,...j->...i", ellipsoid_R, ray_direction)
    ot = RT_o / ellipsoid_S
    dt = RT_d / ellipsoid_S

    A = jnp.sum(dt * dt, axis=-1)
    A = jnp.where(jnp.abs(A) < eps, eps, A)
    B = 2.0 * jnp.sum(ot * dt, axis=-1)
    C = jnp.sum(ot * ot, axis=-1) - 1.0
    disc = B * B - 4.0 * A * C
    disc_clamped = jnp.where(jnp.abs(disc) < eps, 0.0, jnp.maximum(disc, 0.0))
    sqrt_disc = jnp.sqrt(disc_clamped)
    t1 = (-B - sqrt_disc) / (2.0 * A)
    t2 = (-B + sqrt_disc) / (2.0 * A)
    t_hit = jnp.where(t1 >= 0, t1, t2)
    t_hit = jnp.where(jnp.abs(t1 - t2) < eps, jnp.minimum(t1, t2), t_hit)
    has_hit = (disc >= 0) & ((t1 >= 0) | (t2 >= 0))

    p_unit = ot + t_hit[..., None] * dt
    p_world = jnp.einsum(
        "...ij,...j->...i", ellipsoid_R, p_unit * ellipsoid_S) + ellipsoid_t
    return has_hit, jnp.where(has_hit[..., None], p_world,
                              jnp.zeros_like(p_world))


def get_point_to_line_vector(point, line_origin, line_direction):
    """Vector from point to its projection on the line
    (reference: utils.py:85-108)."""
    op = point - line_origin
    scale = (jnp.sum(op * line_direction, axis=-1)
             / jnp.sum(line_direction * line_direction, axis=-1))
    q = line_origin + scale[..., None] * line_direction
    return point - q


def get_ray_origin_and_direction_from_camera(T_pointcloud_camera,
                                             camera_info: CameraInfo):
    """Per-pixel rays through pixel centers (reference: utils.py:111-167).

    Returns (ray_origin (3,), direction (H, W, 3) normalized).
    """
    intr = jnp.asarray(camera_info.camera_intrinsics, jnp.float32)
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    h, w = camera_info.camera_height, camera_info.camera_width
    u = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    v = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    dir_cam = jnp.stack([
        jnp.broadcast_to((u - cx) / fx, (h, w)),
        jnp.broadcast_to((v - cy) / fy, (h, w)),
        jnp.ones((h, w), jnp.float32),
    ], axis=-1)
    R = T_pointcloud_camera[:3, :3]
    direction = jnp.einsum("ij,hwj->hwi", R, dir_cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return T_pointcloud_camera[:3, 3], direction


def get_ray_origin_and_direction_by_uv(pixel_u, pixel_v, camera_intrinsics,
                                       T_camera_pointcloud):
    """Single-pixel ray from the camera-from-world transform
    (reference: utils.py:170-197)."""
    intr = jnp.asarray(camera_intrinsics, jnp.float32)
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    dir_cam = jnp.stack([
        (pixel_u + 0.5 - cx) / fx,
        (pixel_v + 0.5 - cy) / fy,
        jnp.ones_like(jnp.asarray(pixel_u, jnp.float32)),
    ], axis=-1)
    T_pc = inverse_SE3(T_camera_pointcloud)
    ray_origin = T_pc[..., :3, 3]
    direction = jnp.einsum("...ij,...j->...i", T_pc[..., :3, :3], dir_cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return ray_origin, direction
