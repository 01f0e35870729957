"""Quaternion / SE(3) math in pure jnp.

Numeric contracts mirror the reference's Taichi/torch utilities:
- quaternion layout is (x, y, z, w) throughout
  (reference: utils.py:200-220, 396-432).
- ``rotation_matrix_from_quaternion`` assumes a unit quaternion
  (reference: GaussianPoint3D.py:30-48).
- ``rotation_matrix_to_quaternion`` follows the same 4-branch Shepperd
  construction as the reference's torch version (reference: utils.py:435-483)
  so dataset pose conversion is bit-compatible.

All functions are written batched-over-leading-axes where natural and are
safe under ``vmap`` / ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_multiply(q1, q2):
    """Hamilton product with (x, y, z, w) layout (reference: utils.py:200-207)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quaternion_conjugate(q):
    return jnp.concatenate([-q[..., 0:3], q[..., 3:4]], axis=-1)


def quaternion_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q (reference: utils.py:215-220)."""
    qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    out = quaternion_multiply(quaternion_multiply(q, qv), quaternion_conjugate(q))
    return out[..., :3]


def quaternion_normalize(q, eps: float = 0.0):
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return q / norm


def rotation_matrix_from_quaternion(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3).

    Same expansion as reference GaussianPoint3D.py:30-48 (assumes |q| = 1).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def transform_matrix_from_quaternion_and_translation(q, t):
    """(q, t) -> 4x4 SE(3) matrix (reference: GaussianPoint3D.py:51-62)."""
    R = rotation_matrix_from_quaternion(q)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_SE3(transform):
    """Invert 4x4 SE(3) matrices (reference: utils.py:386-393, 495-510)."""
    R_T = jnp.swapaxes(transform[..., :3, :3], -1, -2)
    t = transform[..., :3, 3]
    t_inv = -jnp.einsum("...ij,...j->...i", R_T, t, precision="highest")
    top = jnp.concatenate([R_T, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=transform.dtype),
        transform.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_SE3_qt(q, t):
    """Invert an SE(3) given as (quaternion, translation)
    (reference: utils.py:426-432)."""
    q_inv = quaternion_conjugate(q)
    t_inv = -quaternion_rotate(quaternion_normalize(q_inv), t)
    return q_inv, t_inv


def rotation_matrix_to_quaternion(R):
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4), (x,y,z,w).

    Branch-free rewrite of the reference's 4-case Shepperd method
    (reference: utils.py:435-483); selects the same branch per element so the
    sign conventions match the reference's dataset pose conversion exactly.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]

    # Branch 0: trace > 0
    s0 = 0.5 / jnp.sqrt(jnp.maximum(1 + trace, 1e-12))
    q0 = jnp.stack([
        (R[..., 2, 1] - R[..., 1, 2]) * s0,
        (R[..., 0, 2] - R[..., 2, 0]) * s0,
        (R[..., 1, 0] - R[..., 0, 1]) * s0,
        0.25 / s0,
    ], axis=-1)

    # Branch 1: R00 largest diagonal
    s1 = 2.0 * jnp.sqrt(jnp.maximum(
        1 + R[..., 0, 0] - R[..., 1, 1] - R[..., 2, 2], 1e-12))
    q1 = jnp.stack([
        0.25 * s1,
        (R[..., 0, 1] + R[..., 1, 0]) / s1,
        (R[..., 0, 2] + R[..., 2, 0]) / s1,
        (R[..., 2, 1] - R[..., 1, 2]) / s1,
    ], axis=-1)

    # Branch 2: R11 largest diagonal
    s2 = 2.0 * jnp.sqrt(jnp.maximum(
        1 + R[..., 1, 1] - R[..., 0, 0] - R[..., 2, 2], 1e-12))
    q2 = jnp.stack([
        (R[..., 0, 1] + R[..., 1, 0]) / s2,
        0.25 * s2,
        (R[..., 1, 2] + R[..., 2, 1]) / s2,
        (R[..., 0, 2] - R[..., 2, 0]) / s2,
    ], axis=-1)

    # Branch 3: R22 largest diagonal
    s3 = 2.0 * jnp.sqrt(jnp.maximum(
        1 + R[..., 2, 2] - R[..., 0, 0] - R[..., 1, 1], 1e-12))
    q3 = jnp.stack([
        (R[..., 0, 2] + R[..., 2, 0]) / s3,
        (R[..., 1, 2] + R[..., 2, 1]) / s3,
        0.25 * s3,
        (R[..., 1, 0] - R[..., 0, 1]) / s3,
    ], axis=-1)

    mask0 = trace > 0
    mask1 = (~mask0) & (R[..., 0, 0] > R[..., 1, 1]) & (R[..., 0, 0] > R[..., 2, 2])
    mask2 = (~mask0) & (~mask1) & (R[..., 1, 1] > R[..., 2, 2])

    q = jnp.where(mask0[..., None], q0,
                  jnp.where(mask1[..., None], q1,
                            jnp.where(mask2[..., None], q2, q3)))
    return q


def SE3_to_quaternion_and_translation(transform):
    """4x4 SE(3) (..., 4, 4) -> (q (..., 4), t (..., 3))
    (reference: utils.py:486-492)."""
    return rotation_matrix_to_quaternion(transform[..., :3, :3]), transform[..., :3, 3]
