"""Mid-scale quality validation: full training with densification on a
synthetic multi-view scene must reach a PSNR bar.

This is the closest offline stand-in for the reference's real-data CI gate
(reference: ci/run_experiment.py): a ground-truth gaussian scene is rendered
from several viewpoints, then the full trainer (projection, binning, Pallas
blend, SSIM loss, dual Adam, SH curriculum, adaptive controller) fits a
noisy, subsampled initialization to those images.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import PIL.Image
import pytest

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    SE3_to_quaternion_and_translation, rotation_matrix_from_quaternion)
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    AdaptiveControllerConfig)
from taichi_3d_gaussian_splatting_tpu.training.loss import LossFunctionConfig

H = W = 64
F = 60.0


def _orbit_pose(angle, radius=2.5):
    """Camera on a circle in the xz plane looking at the origin."""
    eye = np.array([radius * np.sin(angle), 0.0, -radius * np.cos(angle)])
    forward = -eye / np.linalg.norm(eye)      # toward origin (camera z)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, forward, eye
    return T


def _make_dataset(tmp_path, n_views=32, n_points=200, seed=0):
    rng = np.random.default_rng(seed)
    pc = rng.uniform(-0.6, 0.6, (n_points, 3)).astype(np.float32)
    feats = np.zeros((n_points, 56), np.float32)
    q = rng.normal(size=(n_points, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.2, -2.2, (n_points, 3))
    feats[:, 7] = rng.uniform(1.0, 4.0, n_points)
    # DC plus genuine band-1 view dependence: the SH curriculum must HELP
    # held-out views, not act as pure per-view overfitting capacity
    feats[:, 8] = rng.normal(size=n_points) * 1.5
    feats[:, 24] = rng.normal(size=n_points) * 1.5
    feats[:, 40] = rng.normal(size=n_points) * 1.5
    for ch in (9, 25, 41):
        feats[:, ch:ch + 3] = rng.normal(size=(n_points, 3)) * 0.4

    intr = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
    cfg = RasterizerConfig(near_plane=0.3, far_plane=50.0,
                           max_tiles_per_point=16, big_point_divisor=4)
    records = []
    os.makedirs(tmp_path / "images", exist_ok=True)
    for vi in range(n_views):
        T_pc_cam = _orbit_pose(2 * np.pi * vi / n_views)
        q_cam, t_cam = SE3_to_quaternion_and_translation(
            jnp.asarray(np.linalg.inv(T_pc_cam))[None])
        # rasterize wants camera-from... the rasterizer takes
        # q/t_pointcloud_camera (camera-to-world) and inverts internally
        qpc, tpc = SE3_to_quaternion_and_translation(
            jnp.asarray(T_pc_cam)[None])
        result = rasterize(
            jnp.array(pc), jnp.array(feats),
            jnp.zeros((n_points,), jnp.int8),
            jnp.zeros((n_points,), jnp.int32),
            qpc, tpc, cam, cfg)
        img = np.clip(np.asarray(result.image), 0, 1)
        path = str(tmp_path / "images" / f"v{vi}.png")
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(path)
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T_pc_cam.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": H, "camera_width": W, "camera_id": 0,
        })
    # held-out split: every 8th view is validation-ONLY (excluded from
    # training, unlike the reference CI which validates on every 8th view
    # that it also never trains on, reference: tools/prepare_colmap.py:304)
    val_records = records[::8]
    train_records = [r for i, r in enumerate(records) if i % 8 != 0]
    with open(tmp_path / "train.json", "w") as f:
        json.dump(train_records, f)
    with open(tmp_path / "val.json", "w") as f:
        json.dump(val_records, f)

    # subsampled + noisy init: the controller must densify to recover
    import pandas as pd
    keep = rng.random(n_points) < 0.5
    init_pc = pc[keep] + rng.normal(scale=0.03, size=(keep.sum(), 3))
    pd.DataFrame(init_pc.astype(np.float32), columns=["x", "y", "z"]
                 ).to_parquet(tmp_path / "point_cloud.parquet")
    return tmp_path


@pytest.mark.slow
def test_full_training_reaches_psnr_bar(tmp_path):
    _make_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=str(tmp_path / "train.json"),
        val_dataset_json_path=str(tmp_path / "val.json"),
        pointcloud_parquet_path=str(tmp_path / "point_cloud.parquet"),
        num_iterations=601,
        val_interval=300,
        feature_learning_rate=0.02,
        position_learning_rate=2e-4,
        position_learning_rate_decay_rate=0.995,
        increase_color_max_sh_band_interval=100,
        initial_downsample_factor=1,
        log_loss_interval=50,
        log_metrics_interval=100,
        log_image_interval=10 ** 9,
        save_full_checkpoint=False,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            near_plane=0.3, far_plane=50.0, max_tiles_per_point=16,
            big_point_divisor=4),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=40,
            num_iterations_densify=40,
            num_iterations_reset_alpha=10 ** 6,
            densification_view_space_position_gradients_threshold=1e-5,
            # threshold compares MULTI-FRAME accumulated pixel counts (40
            # frames per densify round here): too low marks every candidate
            # over-reconstructed and split-shrinks it each round, collapsing
            # scales to sub-pixel needles (measured: val PSNR 22 -> 15)
            under_reconstructed_num_pixels_threshold=2000,
            transparent_alpha_threshold=-3.0,
            iteration_start_remove_floater=10 ** 9),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=4.0, initial_alpha=0.5,
            max_initial_covariance=0.3),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()

    metrics = {}
    with open(os.path.join(config.summary_writer_log_dir,
                           "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            metrics.update(rec)
    # densification actually ran and added points
    assert metrics.get("value/num_valid_points", 0) > 100
    # quality bar: held-out views (never trained on) must clearly beat the
    # featureless init
    assert metrics["val/psnr"] > 18.0, metrics["val/psnr"]
    assert metrics["train/psnr"] > 18.0, metrics["train/psnr"]
