"""Multi-device data-parallel training step on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianPointCloudScene, SceneConfig)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig
from taichi_3d_gaussian_splatting_tpu.parallel.sharding import (
    make_mesh, make_data_parallel_train_step, replicate_scene)
from taichi_3d_gaussian_splatting_tpu.training.controller import ControllerState
from taichi_3d_gaussian_splatting_tpu.training.loss import (
    LossFunction, LossFunctionConfig)


def _scene(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pc = np.concatenate([rng.uniform(-0.7, 0.7, (n, 2)),
                         rng.uniform(1.5, 3.0, (n, 1))], 1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = -2.0
    feats[:, 7] = 1.0
    feats[:, 8] = 1.0
    return GaussianPointCloudScene.from_arrays(
        pc, SceneConfig(), point_cloud_features=feats)


@pytest.mark.slow
def test_data_parallel_step_runs_and_matches_seq_grads():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    n_dev = min(4, len(jax.devices()))
    h = w = 32
    intr = np.array([[25.0, 0, w / 2], [0, 25.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0, max_tiles_per_point=16)
    scene = _scene()
    n = scene.capacity
    mesh = make_mesh(n_dev)
    loss_fn = LossFunction(LossFunctionConfig(enable_regularization=False))
    feat_opt = optax.sgd(1e-2)  # sgd so grads are directly visible in delta
    pos_opt = optax.sgd(1e-3)
    step = make_data_parallel_train_step(mesh, cam, cfg, loss_fn, feat_opt,
                                         pos_opt, apply_grad_scaling=False)

    b = n_dev
    rng = np.random.default_rng(1)
    images = jnp.array(rng.random((b, h, w, 3)).astype(np.float32))
    qs = jnp.tile(jnp.array([[[0.0, 0.0, 0.0, 1.0]]]), (b, 1, 1))
    ts = jnp.array(rng.normal(scale=0.02, size=(b, 1, 3)).astype(np.float32))
    intrs = jnp.tile(jnp.array(intr)[None], (b, 1, 1))

    opt_feat = feat_opt.init(scene.point_cloud_features)
    opt_pos = pos_opt.init(scene.point_cloud)
    ctrl = ControllerState.zeros(n)
    scene_r = replicate_scene(scene, mesh)
    # sh_band=3 -> the curriculum mask is all-ones, matching the raw
    # sequential gradients below
    (scene2, _, _, ctrl2, metrics, densify_inputs,
     last_maps) = step(scene_r, opt_feat, opt_pos, ctrl,
                       images, qs, ts, intrs, jnp.int32(3))
    assert np.isfinite(float(metrics["loss"]))
    last_stats, last_in_frustum, last_depth, last_uv = densify_inputs
    assert last_in_frustum.shape == (n,)
    assert last_depth.shape == (n,)
    assert last_uv.shape == (n, 2)
    # last-view observability maps (pred/depth/count) are replicated and
    # match an independent single-view render of the batch's last view
    pred, depth_map, count_map = last_maps
    assert pred.shape == (h, w, 3)
    assert depth_map.shape == (h, w)
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import rasterize
    feats_chk = np.asarray(scene.point_cloud_features).copy()
    feats_chk[:, 0:4] /= np.linalg.norm(feats_chk[:, 0:4], axis=1,
                                        keepdims=True)
    res_last = rasterize(scene.point_cloud, jnp.array(feats_chk),
                         scene.point_invalid_mask, scene.point_object_id,
                         qs[-1], ts[-1], cam, cfg)
    np.testing.assert_allclose(
        np.asarray(pred), np.clip(np.asarray(res_last.image), 0.0, 1.0),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(count_map).astype(np.int32),
        np.asarray(res_last.pixel_valid_point_count))

    # sequential reference: same views through the single-device vjp,
    # gradients summed
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        rasterize_with_vjp)

    feats_norm = np.asarray(scene.point_cloud_features).copy()
    feats_norm[:, 0:4] /= np.linalg.norm(feats_norm[:, 0:4], axis=1,
                                         keepdims=True)
    feats_j = jnp.array(feats_norm)
    total_gf = jnp.zeros_like(feats_j)
    for i in range(b):
        result, vjp_fn = rasterize_with_vjp(
            scene.point_cloud, feats_j, scene.point_invalid_mask,
            scene.point_object_id, qs[i], ts[i], cam, cfg)

        def image_loss(image):
            img = jnp.clip(image, 0.0, 1.0)
            loss, _, _ = loss_fn(img, images[i])
            return loss

        g_image = jax.grad(image_loss)(result.image)
        _, gf, _ = vjp_fn(g_image)
        total_gf = total_gf + gf
    expected_feats = feats_j - 1e-2 * total_gf
    np.testing.assert_allclose(np.asarray(scene2.point_cloud_features),
                               np.asarray(expected_feats),
                               rtol=1e-4, atol=1e-6)
    # controller stats accumulated across all chips' views
    assert int(np.asarray(ctrl2.accumulated_num_in_camera).max()) <= b
    assert int(np.asarray(ctrl2.accumulated_num_in_camera).sum()) > 0
