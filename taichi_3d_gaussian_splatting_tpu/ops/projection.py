"""Point-parallel attribute pipeline: 3D Gaussians -> per-point 2D attributes.

TPU-native fusion of the reference's first three kernels into one batched,
differentiable jnp stage operating on the full fixed-capacity point pool:
- `filter_point_in_camera` (reference: GaussianPointCloudRasterisation.py:31-78)
- `generate_point_attributes_in_camera_plane` (reference: :239-315)

Layout discipline (the reason this file is written the way it is): TPU
arrays are tiled (8, 128) on their two minor dims, so an (N, 3, 3) rotation
matrix array physically occupies ~4 KB *per point* and an (N, 2) array pads
its lane dim 64x. Materializing per-point matrices costs gigabytes of HBM
traffic at N ~ 4e5 (measured ~45 ms for this stage before the rewrite).
Everything here is therefore structure-of-arrays: per-point quantities live
in 1-D (N,) arrays (lane-major, no padding), the per-object camera matrices
stay (K, .) and are gathered componentwise, and the output is a NamedTuple
of (N,) columns.

Gradient semantics for the stored quaternion follow the reference: the
quaternion is normalized on read, gradients are computed with respect to the
*normalized* value (the reference normalizes the parameter tensor in place
during forward, reference: :197-205,264). We reproduce this with a
straight-through normalization plus explicit parameter renormalization in
the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT, BOUNDARY_TILES
from .gaussian import ALPHA_SKIP_THRESHOLD, COV_LOW_PASS
from .transforms import (
    quaternion_normalize,
    rotation_matrix_from_quaternion,
)


class PointAttributes(NamedTuple):
    """Per-point 2D attributes as (N,) columns (invalid lanes masked)."""
    u: jnp.ndarray
    v: jnp.ndarray
    depth: jnp.ndarray              # camera-space z
    conic_a: jnp.ndarray
    conic_b: jnp.ndarray
    conic_c: jnp.ndarray
    rescale: jnp.ndarray            # low-pass density rescale (stop-grad)
    alpha_after_activation: jnp.ndarray
    color_r: jnp.ndarray
    color_g: jnp.ndarray
    color_b: jnp.ndarray
    radii: jnp.ndarray              # 3 sqrt(lambda_max) (reference parity)
    in_frustum: jnp.ndarray         # (N,) bool, PURE frustum & valid mask —
    #   the reference's point_in_camera_mask (reference: :31-78); feeds the
    #   adaptive controller's accumulated_num_in_camera statistics
    radius_x: jnp.ndarray = None    # per-axis extents (3-sigma marginals,
    radius_y: jnp.ndarray = None    # opacity-bounded); the binning's bbox
    nonfinite_points: jnp.ndarray = None  # () count of valid points culled
    #   because an attribute went inf/NaN (numeric containment)
    emit: jnp.ndarray = None        # (N,) bool, in_frustum & finite &
    #   visible — the binning/emission mask (strict subset of in_frustum:
    #   invisible peak < 1/255 and non-finite splats emit no keys)

    # ---- convenience views (materialize small stacked arrays on demand;
    # used by tests / the jnp oracle, not the hot path) ----
    @property
    def uv(self):
        return jnp.stack([self.u, self.v], axis=-1)

    @property
    def conic_and_rescale(self):
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c,
                          self.rescale], axis=-1)

    @property
    def color(self):
        return jnp.stack([self.color_r, self.color_g, self.color_b], axis=-1)


def normalize_straight_through_columns(qx, qy, qz, qw):
    """Value = q/|q| componentwise, jacobian = diag(1/|q|) (identity when
    already unit) - the reference's grad-wrt-normalized-quaternion shortcut
    (reference: GaussianPointCloudRasterisation.py:197-205).

    The squared norm is floored so an all-zero quaternion (a padded/invalid
    pool slot) yields 0, not 0*inf=NaN: a NaN here rides the VJP into the
    Adam moments of that slot (0-cotangent times inf-jacobian is NaN) and
    permanently poisons it - every point densification later places there
    would go NaN after one optimizer step and be pruned as transparent."""
    inv = jax.lax.stop_gradient(
        jax.lax.rsqrt(jnp.maximum(qx * qx + qy * qy + qz * qz + qw * qw,
                                  1e-24)))
    return qx * inv, qy * inv, qz * inv, qw * inv


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
    object_edit=None,                 # optional (q (K,4), s (K,3), t (K,3))
    #   per-object scene-editing transform: each point becomes
    #   R_e @ (p * s_e + t_e) and its covariance R_e S_e Sigma S_e R_e^T,
    #   matching the reference's editing variants
    #   (reference: GaussianPoint3D.py:118-130,193-235; dead code there,
    #   live and tested here). None costs nothing in the training hot path.
) -> PointAttributes:
    intrinsics = jnp.asarray(camera_info.camera_intrinsics, jnp.float32)
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]

    # per-object camera rotation (K small; stays a (K, 3, 3) matrix)
    R_obj = rotation_matrix_from_quaternion(
        quaternion_normalize(q_camera_pointcloud))       # (K, 3, 3)
    num_objects = q_camera_pointcloud.shape[0]
    if num_objects == 1:
        # single-object fast path (training / standard rendering): scalars
        # broadcast for free - per-point gathers from tiny tables are slow
        # (~8 ns/element on TPU, i.e. tens of ms at N ~ 4e5)
        w00, w01, w02 = R_obj[0, 0, 0], R_obj[0, 0, 1], R_obj[0, 0, 2]
        w10, w11, w12 = R_obj[0, 1, 0], R_obj[0, 1, 1], R_obj[0, 1, 2]
        w20, w21, w22 = R_obj[0, 2, 0], R_obj[0, 2, 1], R_obj[0, 2, 2]
        tcx, tcy, tcz = (t_camera_pointcloud[0, 0],
                         t_camera_pointcloud[0, 1], t_camera_pointcloud[0, 2])
        ox, oy, oz = (t_pointcloud_camera[0, 0], t_pointcloud_camera[0, 1],
                      t_pointcloud_camera[0, 2])
    else:
        # multi-object: ONE lane-gather of a packed (16, K) table -> (16, N)
        table = jnp.stack([
            R_obj[:, 0, 0], R_obj[:, 0, 1], R_obj[:, 0, 2],
            R_obj[:, 1, 0], R_obj[:, 1, 1], R_obj[:, 1, 2],
            R_obj[:, 2, 0], R_obj[:, 2, 1], R_obj[:, 2, 2],
            t_camera_pointcloud[:, 0], t_camera_pointcloud[:, 1],
            t_camera_pointcloud[:, 2],
            t_pointcloud_camera[:, 0], t_pointcloud_camera[:, 1],
            t_pointcloud_camera[:, 2],
            jnp.zeros((num_objects,), jnp.float32),
        ], axis=0)                                        # (16, K)
        per_point = table[:, point_object_id]             # (16, N)
        (w00, w01, w02, w10, w11, w12, w20, w21, w22,
         tcx, tcy, tcz, ox, oy, oz, _) = per_point

    # single transposes to lane-major; every later read is an (N,) row
    pc_t = pointcloud.T                  # (3, N)
    feats_t = pointcloud_features.T      # (56, N)
    px, py, pz = pc_t[0], pc_t[1], pc_t[2]

    if object_edit is not None:
        # scene editing: p' = R_e (p * s_e + t_e)
        # (reference: GaussianPoint3D.py:119-130)
        q_e, s_e, t_e = object_edit
        R_e = rotation_matrix_from_quaternion(
            quaternion_normalize(jnp.asarray(q_e)))      # (K, 3, 3)
        s_e = jnp.asarray(s_e, jnp.float32)
        t_e = jnp.asarray(t_e, jnp.float32)
        if num_objects == 1:
            (e00, e01, e02, e10, e11, e12, e20, e21, e22) = (
                R_e[0, 0, 0], R_e[0, 0, 1], R_e[0, 0, 2],
                R_e[0, 1, 0], R_e[0, 1, 1], R_e[0, 1, 2],
                R_e[0, 2, 0], R_e[0, 2, 1], R_e[0, 2, 2])
            sex, sey, sez = s_e[0, 0], s_e[0, 1], s_e[0, 2]
            tex, tey, tez = t_e[0, 0], t_e[0, 1], t_e[0, 2]
        else:
            edit_tbl = jnp.stack([
                R_e[:, 0, 0], R_e[:, 0, 1], R_e[:, 0, 2],
                R_e[:, 1, 0], R_e[:, 1, 1], R_e[:, 1, 2],
                R_e[:, 2, 0], R_e[:, 2, 1], R_e[:, 2, 2],
                s_e[:, 0], s_e[:, 1], s_e[:, 2],
                t_e[:, 0], t_e[:, 1], t_e[:, 2],
                jnp.zeros((num_objects,), jnp.float32),
            ], axis=0)                                    # (16, K)
            (e00, e01, e02, e10, e11, e12, e20, e21, e22,
             sex, sey, sez, tex, tey, tez, _) = edit_tbl[:, point_object_id]
        ax = px * sex + tex
        ay = py * sey + tey
        az = pz * sez + tez
        px = e00 * ax + e01 * ay + e02 * az
        py = e10 * ax + e11 * ay + e12 * az
        pz = e20 * ax + e21 * ay + e22 * az

    # ---- project position (reference: GaussianPoint3D.py:14-27) ----
    xc = w00 * px + w01 * py + w02 * pz + tcx
    yc = w10 * px + w11 * py + w12 * pz + tcy
    zc = w20 * px + w21 * py + w22 * pz + tcz
    # the projection math divides by zc, which is <= 0 for padded slots at
    # the camera origin and for points behind the camera: 0 * inf = NaN
    # would ride the VJP into that slot's optimizer moments even with a
    # zero cotangent (see normalize_straight_through_columns), and near
    # zc -> 0 the EWA covariance grows ~1/z^4 until f32 cancellation makes
    # the filtered determinant <= 0 (measured on the round-4 campaign:
    # ~170 behind-camera rows/iter with collapsed scales went NaN this
    # way). Project with zc clamped at the near plane: bit-exact for every
    # renderable point (in-frustum requires zc > near_plane), and every
    # culled point gets bounded attributes with FINITE jacobians instead
    # of garbage. The frustum test below keeps the TRUE zc.
    zc_proj = jnp.maximum(zc, near_plane)
    inv_z = 1.0 / zc_proj
    u = fx * xc * inv_z + cx
    v = fy * yc * inv_z + cy

    # ---- quaternion (straight-through normalize) + rotation ----
    qx, qy, qz_, qw = normalize_straight_through_columns(
        feats_t[0], feats_t[1], feats_t[2], feats_t[3])
    r00 = 1 - 2 * (qy * qy + qz_ * qz_)
    r01 = 2 * (qx * qy - qw * qz_)
    r02 = 2 * (qx * qz_ + qw * qy)
    r10 = 2 * (qx * qy + qw * qz_)
    r11 = 1 - 2 * (qx * qx + qz_ * qz_)
    r12 = 2 * (qy * qz_ - qw * qx)
    r20 = 2 * (qx * qz_ - qw * qy)
    r21 = 2 * (qy * qz_ + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    sx = jnp.exp(feats_t[4])
    sy = jnp.exp(feats_t[5])
    sz = jnp.exp(feats_t[6])
    # M = R diag(s): columns scaled
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    if object_edit is not None:
        # Sigma' = (R_e S_e) Sigma (R_e S_e)^T, i.e. M' = R_e (S_e M)
        # (reference: GaussianPoint3D.py:196-235)
        b0j0, b0j1, b0j2 = sex * m00, sex * m01, sex * m02
        b1j0, b1j1, b1j2 = sey * m10, sey * m11, sey * m12
        b2j0, b2j1, b2j2 = sez * m20, sez * m21, sez * m22
        m00 = e00 * b0j0 + e01 * b1j0 + e02 * b2j0
        m01 = e00 * b0j1 + e01 * b1j1 + e02 * b2j1
        m02 = e00 * b0j2 + e01 * b1j2 + e02 * b2j2
        m10 = e10 * b0j0 + e11 * b1j0 + e12 * b2j0
        m11 = e10 * b0j1 + e11 * b1j1 + e12 * b2j1
        m12 = e10 * b0j2 + e11 * b1j2 + e12 * b2j2
        m20 = e20 * b0j0 + e21 * b1j0 + e22 * b2j0
        m21 = e20 * b0j1 + e21 * b1j1 + e22 * b2j1
        m22 = e20 * b0j2 + e21 * b1j2 + e22 * b2j2

    # ---- EWA covariance: cov2d = P P^T with P = (J W) M ----
    # J rows (reference jacobian, GaussianPoint3D.py:65-87)
    j00 = fx * inv_z
    j02 = -fx * xc * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * yc * inv_z * inv_z
    jw0x = j00 * w00 + j02 * w20
    jw0y = j00 * w01 + j02 * w21
    jw0z = j00 * w02 + j02 * w22
    jw1x = j11 * w10 + j12 * w20
    jw1y = j11 * w11 + j12 * w21
    jw1z = j11 * w12 + j12 * w22
    p00 = jw0x * m00 + jw0y * m10 + jw0z * m20
    p01 = jw0x * m01 + jw0y * m11 + jw0z * m21
    p02 = jw0x * m02 + jw0y * m12 + jw0z * m22
    p10 = jw1x * m00 + jw1y * m10 + jw1z * m20
    p11 = jw1x * m01 + jw1y * m11 + jw1z * m21
    p12 = jw1x * m02 + jw1y * m12 + jw1z * m22
    cov_a = p00 * p00 + p01 * p01 + p02 * p02
    cov_b = p00 * p10 + p01 * p11 + p02 * p12
    cov_c = p10 * p10 + p11 * p11 + p12 * p12

    # ---- conic + low-pass rescale (reference: utils.py:258-272) ----
    det_pre = cov_a * cov_c - cov_b * cov_b
    fa = cov_a + COV_LOW_PASS
    fc = cov_c + COV_LOW_PASS
    # cov2d = P P^T is PSD, so mathematically det >= COV_LOW_PASS^2 +
    # COV_LOW_PASS*(cov_a+cov_c); in f32 the subtraction cancels
    # catastrophically once cov ~ COV_LOW_PASS/eps (~2.5e6, i.e. extreme
    # but finite splats) and can round to <= 0, sending inf through
    # inv_det and NaN through the VJP. Flooring at the true lower bound is
    # a mathematical no-op that keeps the conic and its jacobian finite.
    det = jnp.maximum(fa * fc - cov_b * cov_b, COV_LOW_PASS * COV_LOW_PASS)
    rescale = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(0.0, det_pre / det)))
    inv_det = 1.0 / det
    conic_a = fc * inv_det
    conic_b = -cov_b * inv_det
    conic_c = fa * inv_det

    # ---- radius = 3 sigma of major axis, from the UNFILTERED covariance
    # (reference: GaussianPointCloudRasterisation.py:311-314) ----
    large_eig = (cov_a + cov_c + jnp.sqrt(
        (cov_a - cov_c) * (cov_a - cov_c) + 4.0 * cov_b * cov_b)) / 2.0
    radii = jnp.sqrt(jnp.maximum(large_eig, 0.0)) * 3.0
    # per-axis 3-sigma extents from the marginal variances: the ellipse
    # {d_Mahalanobis <= 3} spans exactly [u +- 3 sqrt(cov_xx)] x
    # [v +- 3 sqrt(cov_yy)] - a strict subset of the reference's circular
    # [+- 3 sqrt(lambda_max)] box (equal for isotropic splats). Both cut the
    # same d > 3 sigma skirt; binning with the tighter box emits fewer sort
    # keys for anisotropic splats at identical <= 3 sigma coverage (the
    # marginal bound d^2 >= dx^2 / cov_xx guarantees every excluded pixel
    # has d > 3 sigma).
    radius_x = jnp.sqrt(jnp.maximum(cov_a, 0.0)) * 3.0
    radius_y = jnp.sqrt(jnp.maximum(cov_c, 0.0)) * 3.0

    alpha_act = jax.nn.sigmoid(feats_t[7])

    # ---- opacity-aware extent bound (exact wrt the blend's skip gate) ----
    # The blend skips any contribution rescale*alpha*exp(-q/2) < 1/255
    # (ALPHA_SKIP_THRESHOLD, reference: :451), passing no gradient through
    # skipped pairs. Pixels beyond the Mahalanobis radius r_eff where the
    # peak decays to that threshold therefore can never blend, so keys for
    # tiles wholly beyond r_eff are pure overhead: culling them changes
    # neither the image nor any gradient. r_eff^2 = 2 ln(255 * peak),
    # capped at the reference's own 3-sigma box (which truncates opaque
    # splats above the threshold; we keep that coverage identical). The
    # marginal extents for {d : d^T conic d <= r^2} use the FILTERED
    # variances (fa, fc), the matrix the blend's conic actually inverts -
    # that makes the bound conservative even where the reference's
    # unfiltered 3-sigma box slightly under-covers small splats. Trained
    # scenes keep a large translucent population (alpha ~ 0.05-0.2 after
    # pruning threshold 0.005), where r_eff ~ 2.2-2.7 cuts key counts
    # 20-45% per splat; fully-invisible splats (peak < 1/255) emit nothing.
    peak = jax.lax.stop_gradient(rescale * alpha_act)
    r_eff = jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(255.0 * jnp.maximum(peak, 1e-30)), 0.0))
    radius_x = jnp.minimum(radius_x,
                           r_eff * jnp.sqrt(jnp.maximum(fa, 0.0)))
    radius_y = jnp.minimum(radius_y,
                           r_eff * jnp.sqrt(jnp.maximum(fc, 0.0)))
    visible = peak >= ALPHA_SKIP_THRESHOLD

    # ---- SH color along camera->point ray (reference: :302-308) ----
    dx = px - ox
    dy = py - oy
    dz = pz - oz
    dn = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-37)
    x, y, z = dx * dn, dy * dn, dz * dn
    one = jnp.ones_like(x)
    basis = [
        0.28209479177387814 * one,
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * x * y,
        -1.0925484305920792 * y * z,
        0.94617469575755997 * z * z - 0.31539156525251999,
        -1.0925484305920792 * x * z,
        0.54627421529603959 * (x * x - y * y),
        0.59004358992664352 * y * (-3.0 * x * x + y * y),
        2.8906114426405538 * x * y * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z * z),
        0.3731763325901154 * z * (5.0 * z * z - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z * z),
        1.4453057213202769 * z * (x * x - y * y),
        0.59004358992664352 * x * (-x * x + 3.0 * y * y),
    ]
    if color_sh_mask is not None:
        basis = [b * color_sh_mask[i] for i, b in enumerate(basis)]
    r_sum = sum(feats_t[8 + i] * basis[i] for i in range(16))
    g_sum = sum(feats_t[24 + i] * basis[i] for i in range(16))
    b_sum = sum(feats_t[40 + i] * basis[i] for i in range(16))
    color_r = jax.nn.sigmoid(r_sum)
    color_g = jax.nn.sigmoid(g_sum)
    color_b = jax.nn.sigmoid(b_sum)

    # ---- frustum test (reference: :72-78) ----
    bw = TILE_WIDTH * BOUNDARY_TILES
    bh = TILE_HEIGHT * BOUNDARY_TILES
    valid = point_invalid_mask.astype(jnp.int32) == 0
    in_frustum = ((zc > near_plane) & (zc < far_plane)
                  & (u >= -bw) & (u < camera_info.camera_width + bw)
                  & (v >= -bh) & (v < camera_info.camera_height + bh)
                  & valid)

    # ---- numeric containment: cull non-finite splats ----
    # A single degenerate point (e.g. a scale collapsed far enough that the
    # projected covariance underflows, or a parameter poisoned by a bad
    # optimizer step) must not NaN the blended image: one NaN pixel makes
    # the loss NaN, one NaN loss makes EVERY gradient NaN, and one poisoned
    # Adam step destroys the whole scene (observed: a 30k campaign lost
    # 131k -> 4k points in ~1k iterations after a single non-finite loss).
    # Culling here stops the poison at its source - the point simply does
    # not render this frame - and the count is surfaced so the trainer's
    # guard can report it. The reference has no equivalent (a NaN there
    # propagates until the controller prunes NaN features at the next
    # densify cadence, reference: GaussianPointAdaptiveController.py:205).
    finite = jnp.isfinite(u) & jnp.isfinite(v) & jnp.isfinite(zc)
    for col in (conic_a, conic_b, conic_c, rescale, alpha_act,
                color_r, color_g, color_b, radius_x, radius_y):
        finite = finite & jnp.isfinite(col)
    # counted over ALL valid pool slots, not just in-frustum ones: a NaN
    # u/v/depth fails the frustum comparisons (NaN compares False) and
    # would otherwise be culled without registering, hiding poisoned
    # parameters from the trainer's containment telemetry. With the
    # clamped-zc / floored-det projection above, a finite parameter row
    # always produces finite attributes, so count > 0 means the PARAMETERS
    # are poisoned, wherever the point sits.
    nonfinite_points = jnp.sum((valid & ~finite).astype(jnp.int32))
    # emission mask: invisible splats (peak contribution below the blend's
    # skip gate) emit no keys at all; the reference emits their keys and
    # then skips every pixel, with zero gradient either way (see r_eff
    # above). Kept SEPARATE from in_frustum: the controller's
    # accumulated_num_in_camera counts pure frustum membership like the
    # reference's point_in_camera_mask (reference:
    # GaussianPointAdaptiveController.py:99), so invisible-but-in-frustum
    # splats still age its multi-frame averaging denominator.
    emit = in_frustum & finite & visible

    return PointAttributes(
        u=u, v=v, depth=zc,
        conic_a=conic_a, conic_b=conic_b, conic_c=conic_c, rescale=rescale,
        alpha_after_activation=alpha_act,
        color_r=color_r, color_g=color_g, color_b=color_b,
        radii=radii, in_frustum=in_frustum,
        radius_x=radius_x, radius_y=radius_y,
        nonfinite_points=nonfinite_points,
        emit=emit,
    )
