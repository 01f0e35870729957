"""COLMAP model readers (text and binary), shared by the dataset tools.

Formats follow COLMAP's `src/base/reconstruction.cc` serialization; feature
coverage mirrors what the reference converter understands
(reference: tools/prepare_colmap.py:22-227): cameras.txt/bin,
images.txt/bin, points3D.txt/bin, camera models SIMPLE_PINHOLE / PINHOLE /
SIMPLE_RADIAL / RADIAL (distortion coefficients are ignored, as in the
reference).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

CAMERA_MODEL_NAMES = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclass
class ColmapCamera:
    camera_id: int
    model: str
    width: int
    height: int
    params: list

    @property
    def intrinsics(self) -> np.ndarray:
        p = self.params
        if self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                          "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
            f, cx, cy = p[0], p[1], p[2]
            return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float64)
        # PINHOLE-like: fx fy cx cy
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


@dataclass
class ColmapImage:
    name: str
    qvec: np.ndarray  # (w, x, y, z) - COLMAP convention
    tvec: np.ndarray
    camera_id: int


def _read_bytes(fid, num_bytes, fmt, endian="<"):
    return struct.unpack(endian + fmt, fid.read(num_bytes))


def read_cameras_txt(path) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fields = line.split()
            cam = ColmapCamera(int(fields[0]), fields[1], int(fields[2]),
                               int(fields[3]), [float(x) for x in fields[4:]])
            cameras[cam.camera_id] = cam
    return cameras


def read_cameras_binary(path) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path, "rb") as fid:
        num_cameras = _read_bytes(fid, 8, "Q")[0]
        for _ in range(num_cameras):
            cid, model_id, width, height = _read_bytes(fid, 24, "iiQQ")
            name, num_params = CAMERA_MODEL_NAMES[model_id]
            params = _read_bytes(fid, 8 * num_params, "d" * num_params)
            cameras[cid] = ColmapCamera(cid, name, width, height,
                                        list(params))
    return cameras


def read_images_txt(path) -> Dict[str, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    for i in range(0, len(lines) - len(lines) % 2, 2):
        fields = lines[i].split()
        if len(fields) < 10:
            continue
        name = " ".join(fields[9:])
        images[name] = ColmapImage(
            name=name,
            qvec=np.array(list(map(float, fields[1:5]))),
            tvec=np.array(list(map(float, fields[5:8]))),
            camera_id=int(fields[8]))
    return images


def read_images_binary(path) -> Dict[str, ColmapImage]:
    images = {}
    with open(path, "rb") as fid:
        num = _read_bytes(fid, 8, "Q")[0]
        for _ in range(num):
            props = _read_bytes(fid, 64, "idddddddi")
            qvec = np.array(props[1:5])
            tvec = np.array(props[5:8])
            camera_id = props[8]
            name = b""
            ch = _read_bytes(fid, 1, "c")[0]
            while ch != b"\x00":
                name += ch
                ch = _read_bytes(fid, 1, "c")[0]
            n2d = _read_bytes(fid, 8, "Q")[0]
            fid.read(24 * n2d)
            name = name.decode("utf-8")
            images[name] = ColmapImage(name, qvec, tvec, camera_id)
    return images


def read_points3d_txt(path) -> Tuple[np.ndarray, np.ndarray]:
    xyz, rgb = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fields = line.split()
            xyz.append(list(map(float, fields[1:4])))
            rgb.append(list(map(int, fields[4:7])))
    return np.array(xyz, np.float64), np.array(rgb, np.float64)


def read_points3d_binary(path) -> Tuple[np.ndarray, np.ndarray]:
    xyz, rgb = [], []
    with open(path, "rb") as fid:
        num = _read_bytes(fid, 8, "Q")[0]
        for _ in range(num):
            props = _read_bytes(fid, 43, "QdddBBBd")
            xyz.append(props[1:4])
            rgb.append(props[4:7])
            track_len = _read_bytes(fid, 8, "Q")[0]
            fid.read(8 * track_len)
    return np.array(xyz, np.float64), np.array(rgb, np.float64)


def load_colmap_model(base_path: str):
    """Load (cameras, images, points_xyz, points_rgb), preferring binary."""
    if os.path.exists(os.path.join(base_path, "cameras.bin")):
        cameras = read_cameras_binary(os.path.join(base_path, "cameras.bin"))
    else:
        cameras = read_cameras_txt(os.path.join(base_path, "cameras.txt"))
    if os.path.exists(os.path.join(base_path, "images.bin")):
        images = read_images_binary(os.path.join(base_path, "images.bin"))
    else:
        images = read_images_txt(os.path.join(base_path, "images.txt"))
    for candidate in ("points3D.bin", "points3d.bin"):
        p = os.path.join(base_path, candidate)
        if os.path.exists(p):
            xyz, rgb = read_points3d_binary(p)
            break
    else:
        for candidate in ("points3D.txt", "points3d.txt"):
            p = os.path.join(base_path, candidate)
            if os.path.exists(p):
                xyz, rgb = read_points3d_txt(p)
                break
        else:
            raise FileNotFoundError("no points3D file found")
    return cameras, images, xyz, rgb


def colmap_qvec_to_rotation(qvec: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])
