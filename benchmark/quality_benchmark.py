"""Held-out quality benchmark: full training with densification on a
synthetic multi-view scene at TPU scale.

The reference proves quality on Tanks&Temples Truck (val PSNR 25.21 @ 30k
iterations, reference: README.md:66), but that dataset cannot be shipped
here. This benchmark is the largest offline stand-in that needs no external
data: a ground-truth gaussian scene (geometrically coherent shells, genuine
band-1 view-dependent color) rendered from an orbit of poses; the trainer
must recover it from a noisy, half-subsampled initialization and clear a
HELD-OUT PSNR bar (val views never trained on).

Run on the TPU:  python benchmark/quality_benchmark.py
Options via env: QB_RES (128), QB_VIEWS (48), QB_ITERS (2000),
QB_OUT (logs dir, default /tmp/quality_benchmark).

Prints one JSON line: {"metric": "synthetic_holdout_psnr", ...} and the
full PSNR trajectory.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scene(n_points, rng):
    """Ground truth: points on two concentric shells plus a core cluster -
    coherent geometry (unlike uniform noise) so novel views are honestly
    predictable from the training orbit."""
    n_shell = n_points // 2
    n_shell2 = n_points // 4
    n_core = n_points - n_shell - n_shell2
    def shell(n, r):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return v * r * rng.uniform(0.9, 1.1, (n, 1))
    pc = np.concatenate([
        shell(n_shell, 0.6), shell(n_shell2, 0.35),
        rng.normal(scale=0.12, size=(n_core, 3)),
    ]).astype(np.float32)
    feats = np.zeros((pc.shape[0], 56), np.float32)
    q = rng.normal(size=(pc.shape[0], 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.4, -2.4, (pc.shape[0], 3))
    feats[:, 7] = rng.uniform(1.0, 4.0, pc.shape[0])
    for ch in (8, 24, 40):
        feats[:, ch] = rng.normal(size=pc.shape[0]) * 1.2
        feats[:, ch + 1:ch + 4] = rng.normal(size=(pc.shape[0], 3)) * 0.35
    return pc, feats


def main():
    res = int(os.environ.get("QB_RES", "128"))
    n_views = int(os.environ.get("QB_VIEWS", "48"))
    iters = int(os.environ.get("QB_ITERS", "2000"))
    out_dir = os.environ.get("QB_OUT", "/tmp/quality_benchmark")
    os.makedirs(out_dir, exist_ok=True)

    import jax.numpy as jnp
    import PIL.Image
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, rasterize)
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
        SE3_to_quaternion_and_translation)
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)

    H = W = res
    F = res * 0.95
    rng = np.random.default_rng(0)
    pc, feats = make_scene(600, rng)
    n_points = pc.shape[0]
    intr = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
    cfg = RasterizerConfig(near_plane=0.3, far_plane=50.0,
                           max_tiles_per_point=32, big_point_divisor=4,
                           mid_point_divisor=2)

    def orbit_pose(angle, elev):
        radius = 2.5
        eye = np.array([radius * np.cos(elev) * np.sin(angle),
                        radius * np.sin(elev),
                        -radius * np.cos(elev) * np.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, forward, eye
        return T

    records = []
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    import jax

    @jax.jit
    def render_gt(q, t):
        return rasterize(
            jnp.array(pc), jnp.array(feats),
            jnp.zeros((n_points,), jnp.int8),
            jnp.zeros((n_points,), jnp.int32), q, t, cam, cfg).image

    for vi in range(n_views):
        # two interleaved elevation rings for better coverage
        elev = 0.25 if vi % 2 == 0 else -0.15
        T_pc_cam = orbit_pose(2 * np.pi * vi / n_views, elev)
        qpc, tpc = SE3_to_quaternion_and_translation(
            jnp.asarray(T_pc_cam)[None])
        img = np.clip(np.asarray(render_gt(qpc, tpc)), 0, 1)
        path = os.path.join(img_dir, f"v{vi}.png")
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(path)
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T_pc_cam.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": H, "camera_width": W, "camera_id": 0,
        })
        print(f"rendered GT view {vi + 1}/{n_views}", flush=True)

    # every 8th view strictly held out (reference CI protocol,
    # reference: tools/prepare_colmap.py:304-312)
    val_records = records[::8]
    train_records = [r for i, r in enumerate(records) if i % 8 != 0]
    with open(os.path.join(out_dir, "train.json"), "w") as f:
        json.dump(train_records, f)
    with open(os.path.join(out_dir, "val.json"), "w") as f:
        json.dump(val_records, f)

    import pandas as pd
    keep = rng.random(n_points) < 0.5
    init_pc = pc[keep] + rng.normal(scale=0.03, size=(int(keep.sum()), 3))
    parquet = os.path.join(out_dir, "point_cloud.parquet")
    pd.DataFrame(init_pc.astype(np.float32), columns=["x", "y", "z"]
                 ).to_parquet(parquet)

    config = TrainConfig(
        train_dataset_json_path=os.path.join(out_dir, "train.json"),
        val_dataset_json_path=os.path.join(out_dir, "val.json"),
        pointcloud_parquet_path=parquet,
        num_iterations=iters,
        val_interval=max(iters // 8, 100),
        feature_learning_rate=0.01,
        position_learning_rate=2e-4,
        position_learning_rate_decay_rate=0.995,
        increase_color_max_sh_band_interval=max(iters // 8, 100),
        initial_downsample_factor=1,
        log_loss_interval=100,
        log_metrics_interval=100,
        log_image_interval=10 ** 9,
        log_validation_image=False,
        save_full_checkpoint=False,
        summary_writer_log_dir=os.path.join(out_dir, "logs"),
        rasterisation_config=cfg,
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=200,
            num_iterations_densify=100,
            num_iterations_reset_alpha=10 ** 6,
            densification_view_space_position_gradients_threshold=1e-5,
            under_reconstructed_num_pixels_threshold=4000,
            transparent_alpha_threshold=-2.0,
            iteration_start_remove_floater=10 ** 9),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=5.0, initial_alpha=0.5,
            max_initial_covariance=0.1),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()

    traj = []
    npts = -1
    with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val/psnr" in rec:
                traj.append((rec["iteration"], round(rec["val/psnr"], 2),
                             round(rec.get("val/ssim", 0.0), 4)))
            if "value/num_valid_points" in rec:
                npts = rec["value/num_valid_points"]
    best = max(t[1] for t in traj)
    final = traj[-1]
    print(json.dumps({
        "metric": "synthetic_holdout_psnr",
        "resolution": res, "views": n_views, "iterations": iters,
        "holdout_views": len(val_records),
        "value": final[1], "best": best, "final_ssim": final[2],
        "points": npts, "trajectory": traj,
    }), flush=True)


if __name__ == "__main__":
    main()
