"""Full-state checkpoint save/load round trip + trainer resume."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_3d_gaussian_splatting_tpu.training.checkpoint import (
    load_checkpoint, save_checkpoint)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    state = {
        "a": jnp.array(rng.random((7, 3)).astype(np.float32)),
        "b": (jnp.arange(5, dtype=jnp.int32),
              jnp.array(rng.random(4).astype(np.float32))),
        "key": jax.random.PRNGKey(42),
    }
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, iteration=123, best_psnr=24.5)
    template = jax.tree.map(jnp.zeros_like, state)
    restored, it, best = load_checkpoint(path, template)
    assert it == 123 and abs(best - 24.5) < 1e-9
    for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    state = {"a": jnp.zeros((4,))}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, iteration=1)
    with pytest.raises(AssertionError):
        load_checkpoint(path, {"a": jnp.zeros((5,))})


@pytest.mark.slow
def test_trainer_resume_continues(tmp_path):
    """Train 21 iters, resume from the saved state, continue to 41."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_trainer_e2e import _make_synthetic_dataset
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)

    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)

    def make_config(num_iterations, resume=""):
        return TrainConfig(
            train_dataset_json_path=train_json,
            val_dataset_json_path=val_json,
            pointcloud_parquet_path=parquet,
            num_iterations=num_iterations,
            val_interval=20,
            initial_downsample_factor=1,
            log_loss_interval=10,
            log_image_interval=10 ** 9,
            summary_writer_log_dir=str(tmp_path / "logs"),
            resume_from_checkpoint=resume,
            rasterisation_config=RasterizerConfig(
                near_plane=0.1, far_plane=100.0, max_tiles_per_point=16),
            adaptive_controller_config=AdaptiveControllerConfig(
                num_iterations_warm_up=10 ** 9),
            gaussian_point_cloud_scene_config=SceneConfig(
                max_num_points_ratio=2.0, initial_alpha=1.0),
            loss_function_config=LossFunctionConfig(
                enable_regularization=False),
        )

    trainer = GaussianPointCloudTrainer(make_config(21))
    trainer.train()
    ckpt = os.path.join(str(tmp_path / "logs"), "train_state.npz")
    assert os.path.exists(ckpt)
    feats_at_21 = np.asarray(trainer.scene.point_cloud_features)

    trainer2 = GaussianPointCloudTrainer(make_config(41, resume=ckpt))
    assert trainer2.start_iteration == 21
    np.testing.assert_array_equal(
        np.asarray(trainer2.scene.point_cloud_features), feats_at_21)
    trainer2.train()
    # it actually trained further
    assert not np.allclose(
        np.asarray(trainer2.scene.point_cloud_features), feats_at_21)
