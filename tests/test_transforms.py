"""Math core vs scipy oracles.

Mirrors the reference's oracle cross-validation strategy
(reference: tests/utils_test.py:127-157, tests/GaussianPoint3D_test.py:56-67).
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from taichi_3d_gaussian_splatting_tpu.ops import transforms as T


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)


def test_rotation_matrix_from_quaternion_matches_scipy():
    q = random_quats(100)
    R = np.asarray(T.rotation_matrix_from_quaternion(jnp.array(q)))
    R_scipy = Rotation.from_quat(q).as_matrix()  # scipy uses xyzw too
    np.testing.assert_allclose(R, R_scipy, atol=1e-5)


def test_rotation_matrix_to_quaternion_roundtrip():
    q = random_quats(200, seed=1)
    R = Rotation.from_quat(q).as_matrix().astype(np.float32)
    q_back = np.asarray(T.rotation_matrix_to_quaternion(jnp.array(R)))
    # quaternions are sign-ambiguous; compare rotations
    R_back = Rotation.from_quat(q_back).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_quaternion_multiply_matches_scipy():
    qa = random_quats(50, seed=2)
    qb = random_quats(50, seed=3)
    got = np.asarray(T.quaternion_multiply(jnp.array(qa), jnp.array(qb)))
    want = (Rotation.from_quat(qa) * Rotation.from_quat(qb)).as_quat()
    # sign ambiguity
    sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quaternion_rotate_matches_scipy():
    q = random_quats(50, seed=4)
    rng = np.random.default_rng(5)
    v = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(T.quaternion_rotate(jnp.array(q), jnp.array(v)))
    want = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_inverse_SE3():
    rng = np.random.default_rng(6)
    q = random_quats(20, seed=6)
    t = rng.normal(size=(20, 3)).astype(np.float32)
    M = np.asarray(T.transform_matrix_from_quaternion_and_translation(
        jnp.array(q), jnp.array(t)))
    M_inv = np.asarray(T.inverse_SE3(jnp.array(M)))
    want = np.linalg.inv(M.astype(np.float64))
    np.testing.assert_allclose(M_inv, want, atol=1e-4)


def test_inverse_SE3_qt_consistent_with_matrix_inverse():
    q = random_quats(20, seed=7)
    rng = np.random.default_rng(8)
    t = rng.normal(size=(20, 3)).astype(np.float32)
    q_inv, t_inv = T.inverse_SE3_qt(jnp.array(q), jnp.array(t))
    M = np.asarray(T.transform_matrix_from_quaternion_and_translation(
        jnp.array(q), jnp.array(t)))
    M_inv_direct = np.asarray(T.transform_matrix_from_quaternion_and_translation(
        jnp.asarray(q_inv), jnp.asarray(t_inv)))
    np.testing.assert_allclose(
        M_inv_direct, np.linalg.inv(M.astype(np.float64)), atol=1e-4)


def test_SE3_to_quaternion_and_translation_roundtrip():
    q = random_quats(30, seed=9)
    rng = np.random.default_rng(10)
    t = rng.normal(size=(30, 3)).astype(np.float32)
    M = T.transform_matrix_from_quaternion_and_translation(
        jnp.array(q), jnp.array(t))
    q2, t2 = T.SE3_to_quaternion_and_translation(M)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)
    R1 = Rotation.from_quat(q).as_matrix()
    R2 = Rotation.from_quat(np.asarray(q2)).as_matrix()
    np.testing.assert_allclose(R1, R2, atol=1e-4)
