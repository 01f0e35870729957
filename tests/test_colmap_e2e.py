"""Miniature real-COLMAP end-to-end: binary model -> prepare_colmap CLI ->
train -> render CLI.

The converter unit tests (test_tools.py) use text models and placeholder
images; this exercises the full chain the reference documents for real
captures (reference: README.md dataset preparation + tools/prepare_colmap.py
:62-110 per-model intrinsics): a genuine COLMAP *binary* model (cameras.bin
/ images.bin / points3D.bin in COLMAP's reconstruction.cc layout, including
2D-point tracks the reader must skip) over PINHOLE and SIMPLE_RADIAL
cameras, images actually rendered from those poses, converted by the real
CLI, trained for a few hundred iterations, and rendered back out by the
render CLI.
"""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import PIL.Image
import pytest
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H = 64, 48


def _rotation_to_colmap_qvec(R):
    """Rotation matrix -> COLMAP (w, x, y, z) quaternion."""
    from scipy.spatial.transform import Rotation
    x, y, z, w = Rotation.from_matrix(R).as_quat()
    return np.array([w, x, y, z])


def _orbit_T_pointcloud_camera(angle, radius=2.2, elev=0.25):
    eye = np.array([radius * np.cos(elev) * np.sin(angle),
                    radius * np.sin(elev),
                    -radius * np.cos(elev) * np.cos(angle)])
    forward = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, forward, eye
    return T


def _write_colmap_binary_model(base, images_meta, points_xyz, points_rgb):
    """COLMAP reconstruction.cc binary layout. images_meta: list of
    (image_id, name, qvec wxyz, tvec, camera_id)."""
    os.makedirs(base, exist_ok=True)
    # cameras.bin: PINHOLE (fx fy cx cy) + SIMPLE_RADIAL (f cx cy k)
    with open(os.path.join(base, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<dddd", 50.0, 52.0, W / 2, H / 2))
        f.write(struct.pack("<iiQQ", 2, 2, W, H))
        f.write(struct.pack("<dddd", 55.0, W / 2, H / 2, 1e-4))
    with open(os.path.join(base, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(images_meta)))
        for image_id, name, qvec, tvec, camera_id in images_meta:
            f.write(struct.pack("<idddddddi", image_id, *qvec, *tvec,
                                camera_id))
            f.write(name.encode() + b"\x00")
            # two 2D observations (x, y, point3D_id) the reader must skip
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddQ", 1.0, 2.0, 1))
            f.write(struct.pack("<ddQ", 3.0, 4.0, 2 ** 64 - 1))
    with open(os.path.join(base, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(points_xyz)))
        for i, (xyz, rgb) in enumerate(zip(points_xyz, points_rgb)):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz, *rgb, 0.5))
            f.write(struct.pack("<Q", 1))           # track of length 1
            f.write(struct.pack("<ii", 1, 0))       # (image_id, point2D_idx)


@pytest.mark.slow
def test_colmap_binary_to_render_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    n_points = 40
    pc = np.concatenate([
        rng.uniform(-0.6, 0.6, (n_points, 2)),
        rng.uniform(-0.4, 0.4, (n_points, 1))], axis=1).astype(np.float32)
    feats = np.zeros((n_points, 56), np.float32)
    q = rng.normal(size=(n_points, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.3, -1.6, (n_points, 3))
    feats[:, 7] = 2.5
    feats[:, 8] = rng.normal(size=n_points) + 1.0
    feats[:, 24] = rng.normal(size=n_points) + 0.5
    feats[:, 40] = rng.normal(size=n_points)

    intr_by_cam = {
        1: np.array([[50.0, 0, W / 2], [0, 52.0, H / 2], [0, 0, 1]],
                    np.float32),
        # SIMPLE_RADIAL: single focal; distortion ignored (reference
        # behavior, tools/prepare_colmap.py:62-110)
        2: np.array([[55.0, 0, W / 2], [0, 55.0, H / 2], [0, 0, 1]],
                    np.float32),
    }
    cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                           max_tiles_per_point=16)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir, exist_ok=True)
    images_meta = []
    n_views = 10
    for vi in range(n_views):
        cam_id = 1 + vi % 2
        intr = intr_by_cam[cam_id]
        T_pc_cam = _orbit_T_pointcloud_camera(2 * np.pi * vi / n_views)
        # render the GT image from this pose with this camera's intrinsics
        from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
            SE3_to_quaternion_and_translation)
        qpc, tpc = SE3_to_quaternion_and_translation(
            jnp.asarray(T_pc_cam, jnp.float32)[None])
        cam_info = CameraInfo(camera_intrinsics=intr, camera_height=H,
                              camera_width=W)
        img = rasterize(jnp.array(pc), jnp.array(feats),
                        jnp.zeros((n_points,), jnp.int8),
                        jnp.zeros((n_points,), jnp.int32),
                        qpc, tpc, cam_info, cfg).image
        img = np.clip(np.asarray(img), 0, 1)
        name = f"img_{vi}.png"
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(
            str(img_dir / name))
        # COLMAP stores world->camera [R|t]
        T_cam_pc = np.linalg.inv(T_pc_cam)
        qvec = _rotation_to_colmap_qvec(T_cam_pc[:3, :3])
        images_meta.append((vi + 1, name, qvec, T_cam_pc[:3, 3], cam_id))

    noisy = pc + rng.normal(scale=0.05, size=pc.shape)
    rgbs = rng.integers(0, 256, size=(n_points, 3))
    _write_colmap_binary_model(str(tmp_path / "sparse"), images_meta,
                               noisy, rgbs)

    # 1) the real converter CLI on the binary model
    out_dir = tmp_path / "dataset"
    env = dict(os.environ, T3DGS_FORCE_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_colmap.py"),
         "--base_path", str(tmp_path / "sparse"),
         "--image_path", str(img_dir),
         "--output_dir", str(out_dir),
         "--val_every", "5"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    train_recs = json.load(open(out_dir / "train.json"))
    val_recs = json.load(open(out_dir / "val.json"))
    assert len(train_recs) == 8 and len(val_recs) == 2
    # PINHOLE fx != fy and SIMPLE_RADIAL single-f both came through
    fxfy = {(round(rec["camera_intrinsics"][0][0], 3),
             round(rec["camera_intrinsics"][1][1], 3))
            for rec in train_recs + val_recs}
    assert fxfy == {(50.0, 52.0), (55.0, 55.0)}, fxfy

    # 2) train on the converted dataset
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)
    config = TrainConfig(
        train_dataset_json_path=str(out_dir / "train.json"),
        val_dataset_json_path=str(out_dir / "val.json"),
        pointcloud_parquet_path=str(out_dir / "point_cloud.parquet"),
        num_iterations=201,
        val_interval=200,
        feature_learning_rate=5e-3,
        position_learning_rate=1e-4,
        initial_downsample_factor=1,
        log_loss_interval=20,
        log_image_interval=10 ** 9,
        log_validation_image=False,
        save_full_checkpoint=False,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=cfg,
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=50, num_iterations_densify=50,
            num_iterations_reset_alpha=10 ** 6,
            transparent_alpha_threshold=-3.0),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=2.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()
    losses = []
    with open(tmp_path / "logs" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                losses.append(rec["train/loss"])
    assert len(losses) >= 5 and losses[-1] < losses[0], losses

    # 3) render the held-out poses through the render CLI
    best = tmp_path / "logs" / "best_scene.parquet"
    assert best.exists()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "gaussian_point_render.py"),
         "--parquet_path", str(best),
         "--dataset_json_path", str(out_dir / "val.json"),
         "--output_prefix", str(tmp_path / "frame"),
         "--width", str(W), "--height", str(H),
         "--fx", "50.0", "--fy", "52.0"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    frames = sorted(tmp_path.glob("frame*.png"))
    assert len(frames) == 2, list(tmp_path.iterdir())
    arr = np.asarray(PIL.Image.open(frames[0]))
    assert arr.std() > 1.0, "rendered frame is blank"
