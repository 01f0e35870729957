"""Numeric containment: one degenerate splat must not destroy training.

Observed failure mode (round-4 30k campaign): a single non-finite loss made
every gradient NaN, one Adam step poisoned every parameter, and NaN-pruning
then ate the scene (131k -> 4k points in ~1k iterations). The reference is
equally vulnerable (a NaN there survives until the controller prunes NaN
features at the next densify cadence, reference:
GaussianPointAdaptiveController.py:204-209); a production framework needs
the poison stopped at its source. Three layers, each pinned here:

1. projection culls non-finite splats (ops/projection.py) - the image stays
   finite and the cull is counted;
2. the train step zeroes non-finite per-point gradient rows (0-cotangent x
   inf-jacobian at culled splats must not poison healthy points' moments);
3. the train step skips the WHOLE update when the loss is non-finite
   (parameters, optimizer states, controller accumulators all keep their
   pre-step values).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize, rasterize_with_vjp)


H = W = 32


def _scene(n=20, seed=0):
    rng = np.random.default_rng(seed)
    pc = np.concatenate([
        rng.uniform(-0.5, 0.5, (n, 2)),
        rng.uniform(1.5, 2.5, (n, 1))], axis=1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.5, (n, 3))
    feats[:, 7] = 2.0
    feats[:, 8] = 1.0
    feats[:, 24] = 0.5
    feats[:, 40] = -0.5
    return pc, feats


def _cam():
    intr = np.array([[24.0, 0, W / 2], [0, 24.0, H / 2], [0, 0, 1]],
                    np.float32)
    return CameraInfo(camera_intrinsics=intr, camera_height=H,
                      camera_width=W)


def _render_args(pc, feats):
    n = pc.shape[0]
    return (jnp.array(pc), jnp.array(feats), jnp.zeros((n,), jnp.int8),
            jnp.zeros((n,), jnp.int32), jnp.array([[0.0, 0.0, 0.0, 1.0]]),
            jnp.zeros((1, 3)))


CFG = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                       max_tiles_per_point=16, mid_point_divisor=1,
                       big_point_divisor=2)


def test_nonfinite_splat_is_culled_and_counted():
    pc, feats = _scene()
    clean = rasterize(*_render_args(pc, feats), _cam(), CFG)
    assert int(clean.aux.nonfinite_points) == 0

    bad = feats.copy()
    bad[3, 4] = np.inf     # exp(log-scale) -> inf covariance
    bad[7, 8] = np.nan     # NaN SH coefficient -> NaN color
    out = rasterize(*_render_args(pc, bad), _cam(), CFG)
    assert int(out.aux.nonfinite_points) == 2
    assert bool(jnp.isfinite(out.image).all()), "image must stay finite"
    # healthy points still render: the image is not trivially empty
    assert float(out.image.sum()) > 0.0


def test_nonfinite_grad_rows_do_not_poison_healthy_points():
    pc, feats = _scene()
    bad = feats.copy()
    bad[3, 4] = np.nan
    args = _render_args(pc, bad)
    result, vjp_fn = rasterize_with_vjp(*args, _cam(), CFG)
    grad_pc, grad_feats, _ = vjp_fn(jnp.ones_like(result.image))
    # the culled point's own rows may be NaN (0-cotangent x inf-jacobian);
    # every OTHER row must be finite
    ok_rows = np.all(np.isfinite(np.asarray(grad_feats)), axis=1)
    ok_pc = np.all(np.isfinite(np.asarray(grad_pc)), axis=1)
    assert all(ok_rows[i] for i in range(len(ok_rows)) if i != 3), (
        np.where(~ok_rows))
    assert all(ok_pc[i] for i in range(len(ok_pc)) if i != 3)


def test_collapsed_scale_splat_has_finite_gradients():
    """Root fix for the round-4 chronic nonfinite rows (~170/iter): a
    behind-camera splat with collapsed scales used to blow up the EWA
    covariance ~1/z^2 until the f32-cancelled filtered determinant went
    <= 0 (inf conic -> NaN through the VJP even at zero cotangent). The
    clamped-zc / floored-det projection must give FINITE gradients for
    every parameter row; a visible anisotropic collapsed splat must keep
    finite NONZERO gradients (it still learns)."""
    pc, feats = _scene()
    bad = feats.copy()
    # point 3: behind the camera, barely (the campaign failure shape:
    # depth ~ -0.01, log-scales collapsed on two axes)
    pc2 = pc.copy()
    pc2[3] = [0.3, 0.2, -0.014]
    bad[3, 4:7] = [-7.8, -8.2, -1.9]
    # point 5: in frustum, visible, one axis collapsed
    bad[5, 4] = -9.0
    args = _render_args(pc2, bad)
    result, vjp_fn = rasterize_with_vjp(*args, _cam(), CFG)
    assert int(result.aux.nonfinite_points) == 0
    grad_pc, grad_feats, _ = vjp_fn(jnp.ones_like(result.image))
    assert bool(jnp.isfinite(grad_feats).all()), (
        np.where(~np.all(np.isfinite(np.asarray(grad_feats)), axis=1)))
    assert bool(jnp.isfinite(grad_pc).all())
    # the visible collapsed splat still receives signal
    assert float(jnp.abs(grad_feats[5]).sum()) > 0.0
    assert float(jnp.abs(grad_pc[5]).sum()) > 0.0


def _tiny_trainer(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_trainer_e2e import _make_synthetic_dataset
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=5,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=CFG,
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=2.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(
            enable_regularization=False),
    )
    return GaussianPointCloudTrainer(config)


def test_nonfinite_loss_skips_the_whole_update(tmp_path):
    trainer = _tiny_trainer(tmp_path)
    item = trainer.train_dataset[0]
    step = trainer._get_step_fn(item.camera_info)
    args = (trainer.scene, trainer.opt_state_features,
            trainer.opt_state_positions, trainer.ctrl_state)
    q = jnp.asarray(item.q_pointcloud_camera)
    t = jnp.asarray(item.t_pointcloud_camera)
    intr = jnp.asarray(item.camera_info.camera_intrinsics)

    gt_nan = jnp.full((H, W, 3), jnp.nan, jnp.float32)
    out = step(*args, gt_nan, q, t, jnp.int32(3), intr)
    new_scene, new_opt_feat, _, new_ctrl, metrics = out[:5]
    assert int(metrics["skipped_nonfinite_step"]) == 1
    # quaternion re-normalization is the reference's forward side effect
    # (applied before any update, reference: :264) and survives the skip;
    # everything the OPTIMIZER touches must be bit-identical
    expected = np.asarray(trainer.scene.point_cloud_features).copy()
    qn = expected[:, 0:4]
    expected[:, 0:4] = qn / np.maximum(
        np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    np.testing.assert_array_equal(
        np.asarray(new_scene.point_cloud_features), expected)
    np.testing.assert_array_equal(np.asarray(new_scene.point_cloud),
                                  np.asarray(trainer.scene.point_cloud))
    # optimizer moments untouched
    leaves_new = jax.tree_util.tree_leaves(new_opt_feat)
    leaves_old = jax.tree_util.tree_leaves(trainer.opt_state_features)
    for a, b in zip(leaves_new, leaves_old):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # controller accumulators untouched
    for a, b in zip(jax.tree_util.tree_leaves(new_ctrl),
                    jax.tree_util.tree_leaves(trainer.ctrl_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a clean step still updates (the guard must not block training)
    gt = jnp.zeros((H, W, 3), jnp.float32)
    out = step(*args, gt, q, t, jnp.int32(3), intr)
    new_scene, _, _, _, metrics = out[:5]
    assert int(metrics["skipped_nonfinite_step"]) == 0
    assert not np.array_equal(
        np.asarray(new_scene.point_cloud_features),
        np.asarray(trainer.scene.point_cloud_features))
