"""EWA projection / conic / density vs scipy and numpy oracles.

Mirrors reference test patterns: scipy multivariate_normal density + analytic
grads (reference: tests/utils_test.py:286-348), full EWA covariance projection
vs numpy (reference: tests/GaussianPoint3D_test.py:12-54).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation
from scipy.stats import multivariate_normal

from taichi_3d_gaussian_splatting_tpu.ops import gaussian as G
from taichi_3d_gaussian_splatting_tpu.ops import sh


def test_project_points_pinhole():
    xyz = jnp.array([[0.0, 0.0, 2.0], [0.4, -0.2, 4.0]])
    K = jnp.array([[100.0, 0.0, 50.0], [0.0, 100.0, 40.0], [0.0, 0.0, 1.0]])
    T = jnp.eye(4)
    uv, xyz_cam = G.project_points(xyz, T, K)
    np.testing.assert_allclose(np.asarray(uv[0]), [50.0, 40.0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(uv[1]), [100 * 0.4 / 4 + 50, 100 * -0.2 / 4 + 40], atol=1e-4)
    np.testing.assert_allclose(np.asarray(xyz_cam), np.asarray(xyz), atol=1e-6)


def test_covariance_projection_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n = 32
    q = rng.normal(size=(n, 4))
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    log_s = rng.uniform(-2, 0.5, size=(n, 3)).astype(np.float32)
    xyz_cam = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 8, n)
    ], axis=1).astype(np.float32)
    fx, fy, cx, cy = 300.0, 320.0, 200.0, 150.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    Rwc = Rotation.from_euler("xyz", [0.3, -0.2, 0.1]).as_matrix().astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rwc

    got = np.asarray(G.project_covariance(
        jnp.array(q), jnp.array(log_s), jnp.array(T), jnp.array(K),
        jnp.array(xyz_cam)))

    for i in range(n):
        R = Rotation.from_quat(q[i]).as_matrix()
        S = np.diag(np.exp(log_s[i]))
        Sigma = R @ S @ S.T @ R.T
        x, y, z = xyz_cam[i]
        J = np.array([[fx / z, 0, -fx * x / z**2],
                      [0, fy / z, -fy * y / z**2]])
        want = J @ Rwc @ Sigma @ Rwc.T @ J.T
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-5)


def test_conic_density_matches_scipy():
    rng = np.random.default_rng(1)
    for _ in range(20):
        A = rng.normal(size=(2, 2))
        cov = (A @ A.T + 0.5 * np.eye(2)).astype(np.float32)
        mean = rng.uniform(-3, 3, size=2).astype(np.float32)
        xy = rng.uniform(-5, 5, size=(7, 2)).astype(np.float32)

        conic = G.conic_and_rescale(jnp.array(cov))
        got = np.asarray(G.density_from_conic(
            jnp.array(xy), jnp.array(mean), conic))

        cov_f = cov + np.diag([G.COV_LOW_PASS, G.COV_LOW_PASS])
        rescale = np.sqrt(max(0.0, np.linalg.det(cov) / np.linalg.det(cov_f)))
        # unnormalized density = pdf * 2*pi*sqrt(det)
        pdf = multivariate_normal(mean=mean, cov=cov_f).pdf(xy)
        want = pdf * 2 * np.pi * np.sqrt(np.linalg.det(cov_f)) * rescale
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_point_radii_is_3_sigma_of_major_axis():
    cov = np.array([[4.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    r = float(G.point_radii(jnp.array(cov)))
    assert abs(r - 6.0) < 1e-5  # sqrt(4)*3


def test_sh_basis_matches_reference_constants():
    # Exercise every term against a brute-force numpy transcription of the
    # reference table (reference: SphericalHarmonics.py:10-32).
    rng = np.random.default_rng(2)
    d = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(sh.sh_basis_from_direction(jnp.array(d)))
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    x, y, z = dn[:, 0], dn[:, 1], dn[:, 2]
    want = np.stack([
        0.28209479177387814 * np.ones_like(x),
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
    ], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sh_band_mask():
    np.testing.assert_array_equal(
        np.asarray(sh.sh_band_mask(0)), [1] + [0] * 15)
    np.testing.assert_array_equal(
        np.asarray(sh.sh_band_mask(1)), [1] * 4 + [0] * 12)
    np.testing.assert_array_equal(
        np.asarray(sh.sh_band_mask(2)), [1] * 9 + [0] * 7)
    np.testing.assert_array_equal(np.asarray(sh.sh_band_mask(3)), [1] * 16)


def test_density_gradients_match_reference_analytic_form():
    """Check jax AD of the conic density against the reference's analytic
    gradient formulas (reference: utils.py:332-348)."""
    cov = np.array([[2.0, 0.3], [0.3, 1.5]], dtype=np.float32)
    mean = jnp.array([1.0, -0.5])
    xy = jnp.array([0.3, 0.8])
    conic = G.conic_and_rescale(jnp.array(cov))

    def density_wrt_mean(m):
        return G.density_from_conic(xy, m, conic)

    p = float(density_wrt_mean(mean))
    d_p_d_mean = np.asarray(jax.grad(density_wrt_mean)(mean))

    a, b, c, w = np.asarray(conic)
    inv_cov = np.array([[a, b], [b, c]])
    d = np.asarray(xy - mean)
    cov_inv_d = inv_cov @ d
    want_p = float(np.exp(-0.5 * d @ cov_inv_d) * w)
    want_grad = want_p * cov_inv_d  # d p / d mean (reference: utils.py:343)
    assert abs(p - want_p) < 1e-6
    np.testing.assert_allclose(d_p_d_mean, want_grad, rtol=1e-4)


def test_ellipsoid_foci_vector():
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    log_s = jnp.log(jnp.array([2.0, 1.0, 0.5]))
    v = np.asarray(G.ellipsoid_foci_vector(q, log_s))
    want = np.array([np.sqrt(4.0 - 0.25), 0.0, 0.0])
    np.testing.assert_allclose(v, want, atol=1e-5)


def test_sample_from_gaussian_statistics():
    key = jax.random.PRNGKey(0)
    n = 20000
    q = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1))
    log_s = jnp.tile(jnp.log(jnp.array([1.0, 2.0, 0.5])), (n, 1))
    xyz = jnp.tile(jnp.array([1.0, 2.0, 3.0]), (n, 1))
    samples = np.asarray(G.sample_from_gaussian(key, xyz, q, log_s))
    np.testing.assert_allclose(samples.mean(0), [1, 2, 3], atol=0.05)
    np.testing.assert_allclose(samples.std(0), [1, 2, 0.5], rtol=0.05)
