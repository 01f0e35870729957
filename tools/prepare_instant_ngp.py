"""Instant-NGP / BlenderNeRF transforms.json -> dataset converter.

Rebuild of reference tools/prepare_InstantNGP_with_mesh.py: converts the
OpenGL-convention `transform_matrix` poses to OpenCV by the flip-x matrix
(reference: :36-43) and samples an initial point cloud from a user mesh
surface (reference: :66-80) or, without a mesh, from the camera-frustum
bounding volume.
"""

import argparse
import json
import os

import numpy as np
import pandas as pd

FLIP_X = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def convert_transforms(input_json: dict, image_path_prefix: str):
    """reference: tools/prepare_InstantNGP_with_mesh.py:11-54."""
    records = []
    global_intr = None
    width = input_json.get("w")
    height = input_json.get("h")
    if all(k in input_json for k in ("fl_x", "fl_y", "cx", "cy")):
        global_intr = np.array([
            [input_json["fl_x"], 0, input_json["cx"]],
            [0, input_json["fl_y"], input_json["cy"]],
            [0, 0, 1]])
    for frame in input_json["frames"]:
        intr = global_intr
        if all(k in frame for k in ("fl_x", "fl_y", "cx", "cy")):
            intr = np.array([
                [frame["fl_x"], 0, frame["cx"]],
                [0, frame["fl_y"], frame["cy"]],
                [0, 0, 1]])
        w = frame.get("w", width)
        h = frame.get("h", height)
        assert intr is not None and w and h, "missing camera intrinsics"
        T_opengl = np.array(frame["transform_matrix"],
                            np.float32).reshape(4, 4)
        T_pointcloud_camera = T_opengl @ FLIP_X
        records.append({
            "image_path": os.path.join(image_path_prefix,
                                       frame["file_path"]),
            "T_pointcloud_camera": T_pointcloud_camera.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": int(h),
            "camera_width": int(w),
            "camera_id": 0,
        })
    return records


def sample_mesh_surface(mesh_path: str, count: int) -> np.ndarray:
    """Uniform surface sampling of a triangle mesh (OBJ/PLY), replacing the
    reference's trimesh dependency with a numpy area-weighted sampler."""
    vertices, faces = _load_mesh(mesh_path)
    v0, v1, v2 = (vertices[faces[:, 0]], vertices[faces[:, 1]],
                  vertices[faces[:, 2]])
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = areas / areas.sum()
    rng = np.random.default_rng(0)
    tri = rng.choice(len(faces), size=count, p=probs)
    r1 = np.sqrt(rng.random(count))[:, None]
    r2 = rng.random(count)[:, None]
    return ((1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri]
            + r1 * r2 * v2[tri]).astype(np.float32)


def _load_mesh(path: str):
    if path.endswith(".obj"):
        vertices, faces = [], []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "v":
                    vertices.append([float(x) for x in parts[1:4]])
                elif parts[0] == "f":
                    idx = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                    faces.append(idx)
        return np.array(vertices, np.float32), np.array(faces, np.int64)
    raise ValueError(f"unsupported mesh format: {path} (use .obj)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--transforms_train", type=str, required=True)
    parser.add_argument("--transforms_test", type=str, default=None,
                        help="If not given, every 8th train frame becomes val")
    parser.add_argument("--mesh_path", type=str, default=None)
    parser.add_argument("--mesh_sample_points", type=int, default=500)
    parser.add_argument("--image_path_prefix", type=str, default="")
    parser.add_argument("--output_dir", type=str, required=True)
    args = parser.parse_args()

    with open(args.transforms_train) as f:
        train_records = convert_transforms(json.load(f),
                                           args.image_path_prefix)
    if args.transforms_test:
        with open(args.transforms_test) as f:
            val_records = convert_transforms(json.load(f),
                                             args.image_path_prefix)
    else:
        val_records = train_records[::8]
        train_records = [r for i, r in enumerate(train_records) if i % 8]

    os.makedirs(args.output_dir, exist_ok=True)
    pd.DataFrame(train_records).to_json(
        os.path.join(args.output_dir, "train.json"), orient="records")
    pd.DataFrame(val_records).to_json(
        os.path.join(args.output_dir, "val.json"), orient="records")

    if args.mesh_path:
        points = sample_mesh_surface(args.mesh_path, args.mesh_sample_points)
    else:
        # fall back: sample inside the camera bounding volume
        centers = np.array([np.array(r["T_pointcloud_camera"])[:3, 3]
                            for r in train_records])
        lo, hi = centers.min(0), centers.max(0)
        mid, half = (lo + hi) / 2, (hi - lo) / 2 + 1e-3
        rng = np.random.default_rng(0)
        points = (mid + rng.uniform(-1, 1, (args.mesh_sample_points, 3))
                  * half).astype(np.float32)
    pd.DataFrame(points, columns=["x", "y", "z"]).to_parquet(
        os.path.join(args.output_dir, "point_cloud.parquet"))
    print(f"wrote {len(train_records)} train / {len(val_records)} val views, "
          f"{len(points)} points")


if __name__ == "__main__":
    main()
