"""Per-Gaussian geometry: EWA projection, conic math, split sampling.

Batched jnp re-derivations of the reference's Taichi device functions:
- pinhole projection (reference: GaussianPoint3D.py:14-27)
- approximated 2-row projective jacobian (reference: GaussianPoint3D.py:65-87)
- EWA covariance projection J W Sigma W^T J^T with Sigma = R S S^T R^T,
  S = diag(exp(s)) (reference: GaussianPoint3D.py:161-191)
- conic + low-pass rescale (reference: utils.py:258-272)
- 2D Gaussian density from conic (reference: utils.py:276-284)
- closed-form largest eigenvalue radius
  (reference: GaussianPointCloudRasterisation.py:311-314)
- ellipsoid foci vector and Box-Muller sampling for densification splits
  (reference: GaussianPoint3D.py:375-406)

Feature-row layout contract (reference: GaussianPointCloudRasterisation.py:209-236):
[0:4] quaternion xyzw, [4:7] log-scales, [7] alpha logit,
[8:24]/[24:40]/[40:56] R/G/B SH coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import rotation_matrix_from_quaternion

# Feature layout slices
FEATURE_Q = slice(0, 4)
FEATURE_S = slice(4, 7)
FEATURE_ALPHA = 7
FEATURE_R_SH = slice(8, 24)
FEATURE_G_SH = slice(24, 40)
FEATURE_B_SH = slice(40, 56)
NUM_FEATURES = 56

# Low-pass filter added to the projected covariance diagonal so every
# Gaussian is at least ~1 pixel wide (reference: utils.py:261-265).
COV_LOW_PASS = 0.3

# The blend skips (and passes no gradient through) any per-pixel
# contribution below this (reference: GaussianPointCloudRasterisation.py:451).
# Canonical definition; the blend kernels, the oracle, and the projection's
# opacity-aware extent bound all key off the same constant.
ALPHA_SKIP_THRESHOLD = 1.0 / 255.0


def _mat3_vec(R, v):
    """Batched 3x3 @ 3 as hand-expanded elementwise ops.

    XLA would otherwise lower batched tiny matmuls onto the MXU with massive
    padding (measured ~30x slower at N=4e5); component form runs on the VPU
    at memory bandwidth.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        R[..., 0, 0] * x + R[..., 0, 1] * y + R[..., 0, 2] * z,
        R[..., 1, 0] * x + R[..., 1, 1] * y + R[..., 1, 2] * z,
        R[..., 2, 0] * x + R[..., 2, 1] * y + R[..., 2, 2] * z,
    ], axis=-1)


def project_points(xyz, T_camera_world, intrinsics):
    """World points (..., 3) -> (uv (..., 2), xyz_camera (..., 3)).

    reference: GaussianPoint3D.py:14-27.
    """
    R = T_camera_world[..., :3, :3]
    t = T_camera_world[..., :3, 3]
    xyz_cam = _mat3_vec(R, xyz) + t
    x, y, z = xyz_cam[..., 0], xyz_cam[..., 1], xyz_cam[..., 2]
    u = (intrinsics[0, 0] * x + intrinsics[0, 1] * y
         + intrinsics[0, 2] * z) / z
    v = (intrinsics[1, 0] * x + intrinsics[1, 1] * y
         + intrinsics[1, 2] * z) / z
    return jnp.stack([u, v], axis=-1), xyz_cam


def projective_transform_jacobian(intrinsics, xyz_cam):
    """Approximated 2x3 pinhole jacobian (reference: GaussianPoint3D.py:65-87).

    Note the reference deliberately drops the cx/cz terms; we match.
    """
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    x, y, z = xyz_cam[..., 0], xyz_cam[..., 1], xyz_cam[..., 2]
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([fx / z, zero, -(fx * x) / (z * z)], axis=-1)
    row1 = jnp.stack([zero, fy / z, -(fy * y) / (z * z)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def covariance_3d(q, log_s):
    """Sigma = R S S^T R^T with S = diag(exp(log_s))
    (reference: GaussianPoint3D.py:174-182)."""
    R = rotation_matrix_from_quaternion(q)
    s2 = jnp.exp(2.0 * log_s)
    M = R * s2[..., None, :]  # R @ diag(s^2)
    # Sigma = M @ R^T, expanded per entry
    return jnp.stack([
        jnp.stack([jnp.sum(M[..., 0, :] * R[..., 0, :], -1),
                   jnp.sum(M[..., 0, :] * R[..., 1, :], -1),
                   jnp.sum(M[..., 0, :] * R[..., 2, :], -1)], -1),
        jnp.stack([jnp.sum(M[..., 1, :] * R[..., 0, :], -1),
                   jnp.sum(M[..., 1, :] * R[..., 1, :], -1),
                   jnp.sum(M[..., 1, :] * R[..., 2, :], -1)], -1),
        jnp.stack([jnp.sum(M[..., 2, :] * R[..., 0, :], -1),
                   jnp.sum(M[..., 2, :] * R[..., 1, :], -1),
                   jnp.sum(M[..., 2, :] * R[..., 2, :], -1)], -1),
    ], axis=-2)


def project_covariance(q, log_s, T_camera_world, intrinsics, xyz_cam):
    """EWA-projected 2x2 covariance (reference: GaussianPoint3D.py:161-191).

    Computed as P P^T with P = (J W) (R S): hand-expanded elementwise ops on
    the VPU instead of batched tiny matmuls (see _mat3_vec note).
    """
    W = T_camera_world[..., :3, :3]
    R = rotation_matrix_from_quaternion(q)
    s = jnp.exp(log_s)
    M = R * s[..., None, :]        # (..., 3, 3) = R @ diag(s)

    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    x, y, z = xyz_cam[..., 0], xyz_cam[..., 1], xyz_cam[..., 2]
    inv_z = 1.0 / z
    # J rows (reference jacobian, GaussianPoint3D.py:65-87):
    # [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    j00 = fx * inv_z
    j02 = -fx * x * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * y * inv_z * inv_z
    # JW rows: JW[0,k] = j00 W[0,k] + j02 W[2,k]; JW[1,k] = j11 W[1,k] + j12 W[2,k]
    jw0 = j00[..., None] * W[..., 0, :] + j02[..., None] * W[..., 2, :]
    jw1 = j11[..., None] * W[..., 1, :] + j12[..., None] * W[..., 2, :]
    # P = JW @ M, rows (..., 3)
    p0 = jnp.stack([jnp.sum(jw0 * M[..., :, 0], -1),
                    jnp.sum(jw0 * M[..., :, 1], -1),
                    jnp.sum(jw0 * M[..., :, 2], -1)], -1)
    p1 = jnp.stack([jnp.sum(jw1 * M[..., :, 0], -1),
                    jnp.sum(jw1 * M[..., :, 1], -1),
                    jnp.sum(jw1 * M[..., :, 2], -1)], -1)
    a = jnp.sum(p0 * p0, -1)
    b = jnp.sum(p0 * p1, -1)
    c = jnp.sum(p1 * p1, -1)
    row0 = jnp.stack([a, b], -1)
    row1 = jnp.stack([b, c], -1)
    return jnp.stack([row0, row1], axis=-2)


def conic_and_rescale(cov_uv):
    """2x2 covariance (..., 2, 2) -> (a, b, c, rescale) (..., 4).

    Applies the +0.3 diagonal low-pass and the density rescale
    sqrt(det_prefilter / det_filtered) (reference: utils.py:258-272).
    """
    a0 = cov_uv[..., 0, 0]
    b0 = cov_uv[..., 0, 1]
    b0t = cov_uv[..., 1, 0]
    c0 = cov_uv[..., 1, 1]
    det_pre = a0 * c0 - b0 * b0t
    a = a0 + COV_LOW_PASS
    c = c0 + COV_LOW_PASS
    det = a * c - b0 * b0t
    # the reference never differentiates through the rescale factor
    # (reference: utils.py:347 "known caveat"); match that contract here so
    # every consumer (oracle and Pallas paths) shares the same semantics
    rescale = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(0.0, det_pre / det)))
    inv_det = 1.0 / det
    return jnp.stack([c * inv_det, -b0 * inv_det, a * inv_det, rescale], axis=-1)


def density_from_conic(xy, mean, conic_and_rescale_v):
    """Unnormalized 2D Gaussian density times rescale
    (reference: utils.py:276-284)."""
    d = xy - mean
    a = conic_and_rescale_v[..., 0]
    b = conic_and_rescale_v[..., 1]
    c = conic_and_rescale_v[..., 2]
    w = conic_and_rescale_v[..., 3]
    exponent = (-0.5 * (d[..., 0] * d[..., 0] * a + d[..., 1] * d[..., 1] * c)
                - d[..., 0] * d[..., 1] * b)
    return jnp.exp(exponent) * w


def point_radii(cov_uv):
    """3 sigma of the major axis from the *unfiltered* projected covariance
    (reference: GaussianPointCloudRasterisation.py:311-314)."""
    a = cov_uv[..., 0, 0]
    b = cov_uv[..., 0, 1]
    bt = cov_uv[..., 1, 0]
    c = cov_uv[..., 1, 1]
    large_eig = (a + c + jnp.sqrt((a - c) * (a - c) + 4.0 * b * bt)) / 2.0
    return jnp.sqrt(jnp.maximum(large_eig, 0.0)) * 3.0


def ellipsoid_foci_vector(q, log_s):
    """Vector from ellipsoid center to a focus, along the major axis
    (reference: GaussianPoint3D.py:375-388)."""
    sx, sy, sz = log_s[..., 0], log_s[..., 1], log_s[..., 2]
    base_y = (sx < sy) & (sy > sz)
    base_z = (sx < sz) & (sy < sz)
    ex = jnp.array([1.0, 0.0, 0.0])
    ey = jnp.array([0.0, 1.0, 0.0])
    ez = jnp.array([0.0, 0.0, 1.0])
    base = jnp.where(base_y[..., None], ey,
                     jnp.where(base_z[..., None], ez, ex))
    R = rotation_matrix_from_quaternion(q)
    base = _mat3_vec(R, base)
    s = jnp.exp(log_s)
    r_c = jnp.max(s, axis=-1)
    r_a = jnp.min(s, axis=-1)
    return jnp.sqrt(r_c * r_c - r_a * r_a)[..., None] * base


def sample_from_gaussian(key, xyz, q, log_s):
    """Sample positions from each 3D Gaussian; replaces the reference's
    unseeded per-thread Box-Muller (reference: GaussianPoint3D.py:390-406)
    with explicit jax PRNG keys."""
    z = jax.random.normal(key, xyz.shape, dtype=xyz.dtype)
    R = rotation_matrix_from_quaternion(q)
    s = jnp.exp(log_s)
    return xyz + _mat3_vec(R, s * z)
