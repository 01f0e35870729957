"""CPU sweep for the synthetic quality gate: vary views/iters/threshold,
print the full held-out PSNR trajectory."""
import json
import os
import sys
import tempfile
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import test_quality_synthetic as Q
from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    AdaptiveControllerConfig)
from taichi_3d_gaussian_splatting_tpu.training.loss import LossFunctionConfig

n_views = int(os.environ.get("VIEWS", "32"))
iters = int(os.environ.get("ITERS", "601"))
thresh = float(os.environ.get("THRESH", "3e-6"))

tmp = Path(tempfile.mkdtemp(prefix="qsweep_"))
Q._make_dataset(tmp, n_views=n_views)
config = TrainConfig(
    train_dataset_json_path=str(tmp / "train.json"),
    val_dataset_json_path=str(tmp / "val.json"),
    pointcloud_parquet_path=str(tmp / "point_cloud.parquet"),
    num_iterations=iters,
    val_interval=150,
    feature_learning_rate=float(os.environ.get("FLR","0.02")),
    position_learning_rate=float(os.environ.get("PLR","2e-4")),
    position_learning_rate_decay_rate=0.995,
    increase_color_max_sh_band_interval=int(os.environ.get("SHINT","100")),
    initial_downsample_factor=1,
    log_loss_interval=50,
    log_metrics_interval=100,
    log_image_interval=10 ** 9,
    log_validation_image=False,
    save_full_checkpoint=False,
    summary_writer_log_dir=str(tmp / "logs"),
    rasterisation_config=RasterizerConfig(
        near_plane=0.3, far_plane=50.0, max_tiles_per_point=16,
        big_point_divisor=4),
    adaptive_controller_config=AdaptiveControllerConfig(
        num_iterations_warm_up=int(os.environ.get("WARMUP","40")),
        num_iterations_densify=40,
        num_iterations_reset_alpha=10 ** 6,
        densification_view_space_position_gradients_threshold=thresh,
        under_reconstructed_num_pixels_threshold=int(os.environ.get("URTHRESH","64")),
        transparent_alpha_threshold=-3.0,
        iteration_start_remove_floater=10 ** 9),
    gaussian_point_cloud_scene_config=SceneConfig(
        max_num_points_ratio=4.0, initial_alpha=0.5,
        max_initial_covariance=0.3),
    loss_function_config=LossFunctionConfig(enable_regularization=os.environ.get("REG","0")=="1"),
)
trainer = GaussianPointCloudTrainer(config)
trainer.train()
traj = []
ttraj = []
npts = -1
with open(tmp / "logs" / "metrics.jsonl") as f:
    for line in f:
        rec = json.loads(line)
        if "val/psnr" in rec:
            traj.append((rec["iteration"], round(rec["val/psnr"], 2)))
        if "train/psnr" in rec:
            ttraj.append((rec["iteration"], round(rec["train/psnr"], 2)))
        if "value/num_valid_points" in rec:
            npts = rec["value/num_valid_points"]
import numpy as np
feats = np.asarray(trainer.scene.point_cloud_features)
valid = np.asarray(trainer.scene.point_invalid_mask) == 0
print(f"views={n_views} iters={iters} thresh={thresh} "
      f"val_traj={traj} points={npts}")
print(f"train_traj={ttraj}")
s_ = feats[valid, 4:7]
a_ = feats[valid, 7]
print(f"scale log: min={s_.min():.2f} med={np.median(s_):.2f} "
      f"max={s_.max():.2f}; alpha logit med={np.median(a_):.2f} "
      f"frac>3={np.mean(a_ > 3):.2f}")
