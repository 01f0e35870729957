"""Per-object scene-editing transforms (rotation / scale / translation).

The reference defines these projection variants but never calls them
(reference: GaussianPoint3D.py:118-130,193-235 - dead code); here they are a
live rasterizer capability. Semantics check: rendering with an object_edit
must match rendering a scene with the same transform BAKED into the arrays
(positions p' = R(p*s + t), quaternions composed, isotropic scale folded
into the log-scale features).
"""

import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    quaternion_multiply, quaternion_normalize)

H = W = 32
CFG = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                       max_tiles_per_point=16, mid_point_divisor=1,
                       big_point_divisor=1)


def _camera():
    intr = np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]],
                    np.float32)
    return CameraInfo(camera_intrinsics=intr, camera_height=H,
                      camera_width=W)


def _scene(n=40, seed=3):
    rng = np.random.default_rng(seed)
    pc = np.concatenate([rng.uniform(-0.6, 0.6, (n, 2)),
                         rng.uniform(1.5, 3.0, (n, 1))], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.5, (n, 3))
    feats[:, 7] = 2.0
    feats[:, 8] = rng.normal(size=n) + 1
    feats[:, 24] = rng.normal(size=n)
    feats[:, 40] = rng.normal(size=n) - 0.5
    return pc, feats


def _render(pc, feats, obj=None, object_edit=None, n_obj=1):
    n = pc.shape[0]
    if obj is None:
        obj = np.zeros((n,), np.int32)
    q_cam = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (n_obj, 1))
    t_cam = jnp.zeros((n_obj, 3))
    return np.asarray(rasterize(
        jnp.array(pc), jnp.array(feats), jnp.zeros((n,), jnp.int8),
        jnp.array(obj), q_cam, t_cam, _camera(), CFG,
        object_edit=object_edit).image)


def _rotmat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def test_rotation_translation_edit_matches_baked_transform():
    pc, feats = _scene()
    q_e = np.array([0.0, 0.2588190, 0.0, 0.9659258], np.float32)  # 30 deg y
    t_e = np.array([0.1, -0.05, 0.2], np.float32)
    edit = (jnp.array(q_e)[None], jnp.ones((1, 3)), jnp.array(t_e)[None])
    img_edit = _render(pc, feats, object_edit=edit)

    R = _rotmat(q_e)
    pc_baked = (pc + t_e) @ R.T
    feats_baked = feats.copy()
    q_comp = np.asarray(quaternion_multiply(
        jnp.array(q_e)[None], jnp.array(feats[:, 0:4])))
    feats_baked[:, 0:4] = np.asarray(quaternion_normalize(jnp.array(q_comp)))
    img_baked = _render(pc_baked.astype(np.float32), feats_baked)
    np.testing.assert_allclose(img_edit, img_baked, atol=2e-4)


def test_isotropic_scale_edit_matches_baked_transform():
    pc, feats = _scene(seed=5)
    s = 1.3
    edit = (jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.full((1, 3), s),
            jnp.zeros((1, 3)))
    img_edit = _render(pc, feats, object_edit=edit)

    feats_baked = feats.copy()
    feats_baked[:, 4:7] += np.log(s)
    img_baked = _render((pc * s).astype(np.float32), feats_baked)
    np.testing.assert_allclose(img_edit, img_baked, atol=2e-4)


def test_edit_applies_only_to_its_object():
    pc, feats = _scene(seed=7)
    n = pc.shape[0]
    obj = (np.arange(n) % 2).astype(np.int32)
    identity = (jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (2, 1)),
                jnp.ones((2, 3)), jnp.zeros((2, 3)))
    base = _render(pc, feats, obj=obj, object_edit=identity, n_obj=2)
    # move object 1 far off screen; object-0 pixels must be unchanged
    tx = jnp.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    edit = (identity[0], identity[1], tx)
    moved = _render(pc, feats, obj=obj, object_edit=edit, n_obj=2)
    only0 = _render(pc[obj == 0], feats[obj == 0])
    np.testing.assert_allclose(moved, only0, atol=2e-4)
    assert np.abs(base - moved).max() > 1e-3  # the edit did something
