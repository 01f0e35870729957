"""End-to-end trainer smoke: synthetic dataset -> short training run.

Mirrors the reference's controller-in-the-loop convergence test
(reference: tests/GaussianPointAdaptiveController_test.py:15-95) at a tiny
scale so it runs on the CPU interpreter.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import PIL.Image
import pytest

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianPointCloudScene, SceneConfig)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    AdaptiveControllerConfig)
from taichi_3d_gaussian_splatting_tpu.training.loss import LossFunctionConfig


H = W = 32
F = 24.0


def _make_synthetic_dataset(tmp_path, n_views=3, n_points=30, seed=0):
    """Render a random 'ground truth' scene into PNGs + dataset JSONs."""
    rng = np.random.default_rng(seed)
    pc = np.concatenate([
        rng.uniform(-0.7, 0.7, (n_points, 2)),
        rng.uniform(1.5, 3.0, (n_points, 1))], axis=1).astype(np.float32)
    feats = np.zeros((n_points, 56), np.float32)
    q = rng.normal(size=(n_points, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.5, (n_points, 3))
    feats[:, 7] = 2.0
    feats[:, 8] = rng.normal(size=n_points) + 1
    feats[:, 24] = rng.normal(size=n_points)
    feats[:, 40] = rng.normal(size=n_points) - 0.5

    intr = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0, max_tiles_per_point=16)

    records = []
    os.makedirs(tmp_path / "images", exist_ok=True)
    for v in range(n_views):
        # slight camera shifts (identity rotation)
        t = np.array([0.05 * (v - 1), 0.02 * v, -0.1 * v], np.float32)
        q_cam = np.array([[0.0, 0.0, 0.0, 1.0]], np.float32)
        result = rasterize(
            jnp.array(pc), jnp.array(feats),
            jnp.zeros((n_points,), jnp.int8),
            jnp.zeros((n_points,), jnp.int32),
            jnp.array(q_cam), jnp.array(t[None]), cam, cfg)
        img = np.clip(np.asarray(result.image), 0, 1)
        path = str(tmp_path / "images" / f"view_{v}.png")
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(path)
        T_pc_cam = np.eye(4, dtype=np.float32)
        T_pc_cam[:3, 3] = t
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T_pc_cam.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": H,
            "camera_width": W,
            "camera_id": 0,
        })
    train_json = str(tmp_path / "train.json")
    val_json = str(tmp_path / "val.json")
    with open(train_json, "w") as f:
        json.dump(records, f)
    with open(val_json, "w") as f:
        json.dump(records[:1], f)

    # noisy init point cloud (positions only -> features initialized)
    import pandas as pd
    init_pc = pc + rng.normal(scale=0.05, size=pc.shape).astype(np.float32)
    parquet = str(tmp_path / "point_cloud.parquet")
    pd.DataFrame(init_pc, columns=["x", "y", "z"]).to_parquet(parquet)
    return train_json, val_json, parquet


@pytest.mark.slow
def test_capacity_overflow_fails_loudly(tmp_path):
    """Splats outgrowing the pool budgets mid-training must not degrade
    silently: the continuous guard warns each check and (opted in here)
    raises after three consecutive bad checks."""
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=21,
        val_interval=10 ** 6,
        initial_downsample_factor=1,
        log_loss_interval=10 ** 6,
        log_image_interval=10 ** 9,
        save_full_checkpoint=False,
        overflow_check_interval=1,
        fail_on_capacity_overflow=True,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            near_plane=0.1, far_plane=100.0, max_tiles_per_point=8,
            # pool of ONE entry for both tiers: the many multi-tile splats
            # cannot all fit -> big_point_overflow > 0 every step
            big_point_divisor=10 ** 6, mid_point_divisor=10 ** 6),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=10 ** 6,
            num_iterations_reset_alpha=10 ** 6),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=1.5, initial_alpha=1.0,
            # huge isotropic init covariance -> every splat spans many tiles
            initial_covariance_ratio=50.0, max_initial_covariance=100.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    with pytest.raises(RuntimeError, match="capacity overflow"):
        trainer.train()
    assert trainer._overflow_strikes >= 3


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=41,
        val_interval=40,
        feature_learning_rate=5e-3,
        position_learning_rate=1e-4,
        initial_downsample_factor=1,
        log_loss_interval=10,
        log_metrics_interval=20,
        log_image_interval=10**9,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            # budgets sized so NOTHING overflows: this test pins clean
            # convergence; the guard and self-healing paths have their own
            # tests (test_capacity_overflow_fails_loudly,
            # tests/test_capacity_recovery.py). With the legacy divisor
            # defaults the big-splat init overflowed the mid pool, and the
            # round-4 self-healing recovery then GREW capacity at iteration
            # 20 - previously-dropped splats started rendering mid-run and
            # the loss trajectory stepped upward, which this assertion
            # would misread as divergence
            near_plane=0.1, far_plane=100.0, max_tiles_per_point=16,
            mid_point_divisor=1, big_point_divisor=2),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=10, num_iterations_densify=20,
            num_iterations_reset_alpha=10 ** 6,
            densification_view_space_position_gradients_threshold=1e9),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=2.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(
            enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()

    # losses logged and decreasing overall
    metrics_path = os.path.join(config.summary_writer_log_dir,
                                "metrics.jsonl")
    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                losses.append((rec["iteration"], rec["train/loss"]))
    assert len(losses) >= 4
    assert losses[-1][1] < losses[0][1], losses
    # validation checkpoint written
    assert os.path.exists(os.path.join(config.output_model_dir,
                                       "scene_40.parquet"))
    assert os.path.exists(os.path.join(config.output_model_dir,
                                       "best_scene.parquet"))
    # checkpoint loads back
    scene = GaussianPointCloudScene.from_parquet(
        os.path.join(config.output_model_dir, "best_scene.parquet"))
    assert scene.capacity > 0


@pytest.mark.slow
def test_trainer_end_to_end_multichip(tmp_path):
    """Full trainer loop with batch_size=4 sharded over a 4-device mesh of
    the virtual CPU mesh (conftest): the data-parallel step (psum'd
    gradients + controller stats, parallel/sharding.py) must reach the same
    convergence bar as the single-chip e2e."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual CPU mesh")
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=31,
        val_interval=30,
        batch_size=4,
        mesh_devices=4,
        # this test pins the sharding machinery with hand-set cadences;
        # the per-image schedule scaling has its own unit test
        scale_schedules_with_batch=False,
        scale_lr_with_batch="none",
        feature_learning_rate=2e-3,   # 4 views/step, summed grads
        position_learning_rate=4e-5,
        initial_downsample_factor=1,
        log_loss_interval=5,
        log_metrics_interval=20,
        log_image_interval=10 ** 9,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            # overflow-free budgets, same rationale as test_trainer_end_to_end
            near_plane=0.1, far_plane=100.0, max_tiles_per_point=16,
            mid_point_divisor=1, big_point_divisor=2),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=10, num_iterations_densify=20,
            num_iterations_reset_alpha=10 ** 6,
            densification_view_space_position_gradients_threshold=1e9),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=2.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(
            enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()

    metrics_path = os.path.join(config.summary_writer_log_dir,
                                "metrics.jsonl")
    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                losses.append((rec["iteration"], rec["train/loss"]))
    assert len(losses) >= 4
    assert losses[-1][1] < losses[0][1], losses
    assert os.path.exists(os.path.join(config.output_model_dir,
                                       "best_scene.parquet"))


def test_trainer_auto_capacity(tmp_path):
    """auto_capacity=True derives the binning budgets from the initial
    scene (no hand-set max_keys / pool knobs) and trains without dropping
    work on the probed views."""
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=6,
        val_interval=5,
        initial_downsample_factor=1,
        log_loss_interval=2,
        log_metrics_interval=5,
        log_image_interval=10 ** 9,
        save_full_checkpoint=False,
        summary_writer_log_dir=str(tmp_path / "logs"),
        auto_capacity=True,
        auto_capacity_headroom=1.5,
        rasterisation_config=RasterizerConfig(near_plane=0.1,
                                              far_plane=100.0),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=100, num_iterations_densify=100),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=2.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    rc = trainer.config.rasterisation_config
    assert rc.pool_slots, "probe must install a pool ladder"
    assert rc.max_keys % rc.chunk == 0
    trainer.train()
    # the overflow guard never fired (the synthetic views fit the budgets)
    import json as _json
    with open(tmp_path / "logs" / "metrics.jsonl") as f:
        for line in f:
            assert "train/overflow_strikes" not in _json.loads(line)
