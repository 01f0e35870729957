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


def project_points(xyz, T_camera_world, intrinsics):
    """World points (..., 3) -> (uv (..., 2), xyz_camera (..., 3)).

    reference: GaussianPoint3D.py:14-27.
    """
    R = T_camera_world[..., :3, :3]
    t = T_camera_world[..., :3, 3]
    xyz_cam = jnp.einsum("...ij,...j->...i", R, xyz, precision="highest") + t
    uv1 = jnp.einsum("ij,...j->...i", intrinsics, xyz_cam, precision="highest") / xyz_cam[..., 2:3]
    return uv1[..., :2], xyz_cam


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
    # R @ diag(s^2) @ R^T
    return jnp.einsum("...ik,...k,...jk->...ij", R, s2, R, precision="highest")


def project_covariance(q, log_s, T_camera_world, intrinsics, xyz_cam):
    """EWA-projected 2x2 covariance (reference: GaussianPoint3D.py:161-191)."""
    J = projective_transform_jacobian(intrinsics, xyz_cam)
    W = T_camera_world[..., :3, :3]
    Sigma = covariance_3d(q, log_s)
    JW = jnp.einsum("...ij,...jk->...ik", J, W, precision="highest")
    return jnp.einsum("...ij,...jk,...lk->...il", JW, Sigma, JW, precision="highest")


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
    base = jnp.einsum("...ij,...j->...i", R, base, precision="highest")
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
    return xyz + jnp.einsum("...ij,...j->...i", R, s * z, precision="highest")
