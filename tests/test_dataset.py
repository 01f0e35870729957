"""ImagePoseDataset: crop-to-16, intrinsics rescale, >1600px autoscale
(reference behavior: ImagePoseDataset.py:40-96)."""

import json
import os

import numpy as np
import PIL.Image

from taichi_3d_gaussian_splatting_tpu.data.dataset import (
    ImagePoseDataset, PrefetchLoader)


def _write_dataset(tmp_path, width, height, calib_w=None, calib_h=None):
    rng = np.random.default_rng(0)
    img = (rng.random((height, width, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "img.png")
    PIL.Image.fromarray(img).save(path)
    calib_w = calib_w or width
    calib_h = calib_h or height
    intr = [[100.0, 0.0, calib_w / 2], [0.0, 100.0, calib_h / 2],
            [0.0, 0.0, 1.0]]
    record = {
        "image_path": path,
        "T_pointcloud_camera": np.eye(4).tolist(),
        "camera_intrinsics": intr,
        "camera_height": calib_h,
        "camera_width": calib_w,
        "camera_id": 0,
    }
    json_path = str(tmp_path / "ds.json")
    with open(json_path, "w") as f:
        json.dump([record], f)
    return json_path


def test_crop_to_tile_multiple(tmp_path):
    ds = ImagePoseDataset(_write_dataset(tmp_path, 100, 75))
    item = ds[0]
    assert item.camera_info.camera_width == 96   # 100 -> 96
    assert item.camera_info.camera_height == 64  # 75 -> 64
    assert item.image.shape == (64, 96, 3)
    assert item.image.dtype == np.float32
    assert 0.0 <= item.image.min() and item.image.max() <= 1.0


def test_intrinsics_rescaled_to_real_image_size(tmp_path):
    # calibration said 200x150 but the actual image is 100x75
    ds = ImagePoseDataset(_write_dataset(tmp_path, 100, 75,
                                         calib_w=200, calib_h=150))
    item = ds[0]
    intr = np.asarray(item.camera_info.camera_intrinsics)
    # fx scaled by 100/200, fy by 75/150
    assert abs(intr[0, 0] - 50.0) < 1e-5
    assert abs(intr[1, 1] - 50.0) < 1e-5


def test_autoscale_large_images(tmp_path):
    ds = ImagePoseDataset(_write_dataset(tmp_path, 2048, 1536))
    item = ds[0]
    # short side -> 1024 (scale 2/3 -> 1365x1024), cropped to 16-multiples
    assert item.camera_info.camera_height == 1024
    assert item.camera_info.camera_width == 1360
    assert item.image.shape == (1024, 1360, 3)
    intr = np.asarray(item.camera_info.camera_intrinsics)
    assert abs(intr[0, 0] - 100.0 * (1365 / 2048)) < 0.2


def test_autoscale_respects_long_side_cap(tmp_path):
    # 3200x1000: short side * 1024/1000 would make long side 3276 > 1600,
    # so the long side caps at 1600 (scale = 0.5)
    ds = ImagePoseDataset(_write_dataset(tmp_path, 3200, 1000))
    item = ds[0]
    assert item.camera_info.camera_width == 1600
    assert item.camera_info.camera_height == 496  # 500 cropped to 16


def test_pose_conversion(tmp_path):
    ds = ImagePoseDataset(_write_dataset(tmp_path, 64, 64))
    item = ds[0]
    np.testing.assert_allclose(np.asarray(item.q_pointcloud_camera),
                               [[0, 0, 0, 1]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(item.t_pointcloud_camera),
                               [[0, 0, 0]], atol=1e-6)


def test_prefetch_loader_cycles_and_shuffles(tmp_path):
    json_path = _write_dataset(tmp_path, 64, 64)
    ds = ImagePoseDataset(json_path)
    loader = PrefetchLoader(ds, shuffle=True, num_workers=2, prefetch=2)
    it = iter(loader)
    items = [next(it) for _ in range(3)]  # loops past the 1-item epoch
    assert all(i.image.shape == (64, 64, 3) for i in items)
