"""Dataset preparation tools: COLMAP converter and ellipse path generator."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write_colmap_text_model(base, n_views=6, n_points=50):
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(base, "cameras.txt"), "w") as f:
        f.write("# Camera list\n# fmt\n# count 1\n")
        f.write("1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    with open(os.path.join(base, "images.txt"), "w") as f:
        f.write("# Image list\n#\n#\n#\n")
        for i in range(n_views):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 img_{i}.png\n")
            f.write("\n")  # empty 2D-points line
    with open(os.path.join(base, "points3D.txt"), "w") as f:
        f.write("# 3D point list\n#\n#\n")
        for i in range(n_points):
            x, y, z = rng.normal(size=3)
            r, g, b = rng.integers(0, 255, 3)
            f.write(f"{i + 1} {x} {y} {z} {r} {g} {b} 0.5 1 1\n")


def test_prepare_colmap_text(tmp_path):
    base = str(tmp_path / "colmap")
    out = str(tmp_path / "out")
    _write_colmap_text_model(base)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_colmap.py"),
         "--base_path", base, "--image_path", "/imgs",
         "--output_dir", out],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    import pandas as pd
    train = pd.read_json(os.path.join(out, "train.json"), orient="records")
    val = pd.read_json(os.path.join(out, "val.json"), orient="records")
    assert len(train) + len(val) == 6
    assert len(val) == 1  # every 8th -> index 0 only
    row = train.iloc[0]
    T = np.array(row["T_pointcloud_camera"])
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-12)
    # T is inv([R|t]) with orthonormal R
    R = np.linalg.inv(T)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    K = np.array(row["camera_intrinsics"])
    assert K[0, 0] == 500.0 and K[1, 1] == 510.0
    cloud = pd.read_parquet(os.path.join(out, "point_cloud.parquet"))
    assert len(cloud) == 50
    assert {"x", "y", "z", "r", "g", "b"}.issubset(cloud.columns)


def test_prepare_colmap_test_list(tmp_path):
    base = str(tmp_path / "colmap")
    out = str(tmp_path / "out2")
    _write_colmap_text_model(base)
    test_list = tmp_path / "test_images.txt"
    test_list.write_text("img_2.png\nimg_4.png\n")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_colmap.py"),
         "--base_path", base, "--image_path", "/imgs",
         "--test_image_list_path", str(test_list), "--output_dir", out],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    import pandas as pd
    val = pd.read_json(os.path.join(out, "val.json"), orient="records")
    names = {os.path.basename(p) for p in val["image_path"]}
    assert names == {"img_2.png", "img_4.png"}


def test_generate_ellipse_path(tmp_path):
    # synthetic inward-looking camera ring
    import generate_ellipse_path as gep
    rng = np.random.default_rng(1)
    records = []
    for a in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        eye = np.array([3 * np.cos(a), 3 * np.sin(a), 1.0])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
        records.append({"T_pointcloud_camera": T.tolist()})
    cams = tmp_path / "train.json"
    cams.write_text(json.dumps(records))
    out_prefix = str(tmp_path / "ellipse")
    result = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "generate_ellipse_path.py"),
         "--cameras", str(cams), "--output", out_prefix,
         "--n_frames", "24"],
        capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    poses = np.load(out_prefix + ".npy")
    assert poses.shape == (24, 4, 4)
    # near-orthonormal rotations (the f32 orient/invert chain leaves ~0.5%
    # drift; the renderer re-normalizes via the quaternion conversion)
    for T in poses[:4]:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-2)
    # path stays near the capture ring scale
    radii = np.linalg.norm(poses[:, :3, 3], axis=1)
    assert radii.max() < 10.0 and radii.min() > 0.3


def test_prepare_instant_ngp_transforms(tmp_path):
    from prepare_instant_ngp import convert_transforms, FLIP_X
    transforms = {
        "fl_x": 400.0, "fl_y": 410.0, "cx": 320.0, "cy": 240.0,
        "w": 640, "h": 480,
        "frames": [
            {"file_path": "images/a.png",
             "transform_matrix": np.eye(4).tolist()},
        ],
    }
    records = convert_transforms(transforms, "/root")
    assert len(records) == 1
    T = np.array(records[0]["T_pointcloud_camera"])
    np.testing.assert_allclose(T, FLIP_X, atol=1e-7)
    K = np.array(records[0]["camera_intrinsics"])
    assert K[0, 0] == 400.0 and K[1, 2] == 240.0
    assert records[0]["image_path"] == "/root/images/a.png"
