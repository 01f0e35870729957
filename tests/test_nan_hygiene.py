"""NaN hygiene for padded pool slots.

A padded (invalid) slot used to poison its own Adam moments: the per-step
quaternion renormalization and the projection's straight-through normalize
both divided by |q|=0, and 0-cotangent * inf-jacobian = NaN flowed into the
optimizer state, so every point densification later placed in that slot went
NaN after one step and was pruned as transparent - the pool churned instead
of growing. These tests pin the whole chain finite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianPointCloudScene, SceneConfig)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize_with_vjp)
from taichi_3d_gaussian_splatting_tpu.training.loss import (
    LossFunction, LossFunctionConfig)


def _padded_scene(n=24, ratio=2.0, seed=0, zero_padding=False):
    rng = np.random.default_rng(seed)
    pc = np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)),
                         rng.uniform(1.5, 3.0, (n, 1))], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = -2.0
    feats[:, 7] = 1.0
    feats[:, 8] = 1.0
    scene = GaussianPointCloudScene.from_arrays(
        pc, SceneConfig(max_num_points_ratio=ratio),
        point_cloud_features=feats)
    if zero_padding:
        # the worst case: a checkpoint written before the identity-quat
        # padding fix, every padded feature row exactly zero
        f = np.asarray(scene.point_cloud_features).copy()
        f[n:] = 0.0
        scene = scene._replace(point_cloud_features=jnp.asarray(f))
    return scene


def test_padding_slots_have_identity_quat():
    scene = _padded_scene()
    f = np.asarray(scene.point_cloud_features)
    inv = np.asarray(scene.point_invalid_mask)
    pad = f[inv == 1]
    assert pad.shape[0] > 0
    np.testing.assert_array_equal(
        pad[:, 0:4], np.tile([0.0, 0.0, 0.0, 1.0], (pad.shape[0], 1)))
    assert (pad[:, 3] == 1.0).all()
    assert (np.linalg.norm(pad[:, 0:4], axis=1) == 1.0).all()


def test_train_step_keeps_zero_padding_finite():
    """One full fwd+bwd+Adam step on a scene whose padding rows are ALL-ZERO
    must leave parameters, gradients, and optimizer moments finite."""
    scene = _padded_scene(zero_padding=True)
    h = w = 32
    intr = np.array([[25.0, 0, w / 2], [0, 25.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                           max_tiles_per_point=16)
    loss_fn = LossFunction(LossFunctionConfig(enable_regularization=True))
    gt = jnp.asarray(np.random.default_rng(1).random((h, w, 3)), jnp.float32)
    fopt = optax.adam(1e-3)

    @jax.jit
    def step(scene, opt_state):
        feats = scene.point_cloud_features
        qn = feats[:, 0:4] / jnp.maximum(jnp.linalg.norm(
            feats[:, 0:4], axis=1, keepdims=True), 1e-12)
        feats = feats.at[:, 0:4].set(qn)
        result, vjp_fn = rasterize_with_vjp(
            scene.point_cloud, feats, scene.point_invalid_mask,
            scene.point_object_id,
            jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.zeros((1, 3)), cam, cfg)

        def image_loss(image, features):
            img = jnp.clip(image, 0.0, 1.0)
            loss, _, _ = loss_fn(img, gt,
                                 point_invalid_mask=scene.point_invalid_mask,
                                 pointcloud_features=features)
            return loss

        loss, (g_img, g_direct) = jax.value_and_grad(
            image_loss, argnums=(0, 1))(result.image, feats)
        _, g_feats_raster, _ = vjp_fn(g_img)
        g_feats = g_feats_raster + g_direct
        updates, opt_state = fopt.update(g_feats, opt_state, feats)
        new_feats = optax.apply_updates(feats, updates)
        return scene._replace(point_cloud_features=new_feats), opt_state, \
            loss, g_feats

    opt_state = fopt.init(scene.point_cloud_features)
    for _ in range(2):
        scene, opt_state, loss, g_feats = step(scene, opt_state)
    assert np.isfinite(float(loss)), float(loss)
    assert np.isfinite(np.asarray(g_feats)).all()
    assert np.isfinite(np.asarray(scene.point_cloud_features)).all()
    for leaf in jax.tree.leaves(opt_state):
        assert np.isfinite(np.asarray(leaf)).all()


def test_regularizer_masks_invalid_rows_before_exp():
    loss_fn = LossFunction(LossFunctionConfig(enable_regularization=True))
    feats = np.zeros((4, 56), np.float32)
    feats[2, 4:7] = 1000.0   # exp -> inf on an INVALID row
    feats[3, 4:7] = np.nan   # NaN on an INVALID row
    feats[0:2, 4:7] = -2.0
    invalid = np.array([0, 0, 1, 1], np.int8)
    img = jnp.zeros((16, 16, 3))
    loss, _, _ = loss_fn(img, img, point_invalid_mask=jnp.asarray(invalid),
                         pointcloud_features=jnp.asarray(feats))
    expected = 2.0 * np.linalg.norm([np.exp(-2.0)] * 3)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)
