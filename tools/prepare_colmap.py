"""COLMAP -> train.json / val.json / point_cloud.parquet converter.

Rebuild of reference tools/prepare_colmap.py: reads a COLMAP model (txt or
binary), builds `T_pointcloud_camera = inv([R|t])` per image (reference:
:264-268), splits train/val either by an explicit test-image list or every
8th frame (reference: :304-312), and writes the dataset JSONs plus the
initial colored point cloud parquet (r,g,b kept so scene init can use them).
"""

import argparse
import os

import numpy as np
import pandas as pd

from colmap_io import load_colmap_model, colmap_qvec_to_rotation


def main():
    parser = argparse.ArgumentParser(
        "Prepare dataset for 3D Gaussian Splatting from COLMAP output")
    parser.add_argument("--base_path", type=str, required=True,
                        help="COLMAP model folder (cameras/images/points3D)")
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--test_image_list_path", type=str, default=None)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--val_every", type=int, default=8)
    args = parser.parse_args()

    cameras, images, xyz, rgb = load_colmap_model(args.base_path)

    records = []
    for name, image in images.items():
        camera = cameras[image.camera_id]
        T_camera_pointcloud = np.eye(4)
        T_camera_pointcloud[:3, :3] = colmap_qvec_to_rotation(image.qvec)
        T_camera_pointcloud[:3, 3] = image.tvec
        T_pointcloud_camera = np.linalg.inv(T_camera_pointcloud)
        records.append({
            "image_path": os.path.join(args.image_path, name),
            "T_pointcloud_camera": T_pointcloud_camera.tolist(),
            "camera_intrinsics": camera.intrinsics.tolist(),
            "camera_height": camera.height,
            "camera_width": camera.width,
            "camera_id": camera.camera_id,
        })

    df = pd.DataFrame(records)
    if args.test_image_list_path:
        with open(args.test_image_list_path) as f:
            test_images = {x.strip() for x in f if x.strip()}
        is_train = df["image_path"].apply(
            lambda x: os.path.basename(x) not in test_images)
    else:
        is_train = df.index % args.val_every != 0

    os.makedirs(args.output_dir, exist_ok=True)
    df[is_train].to_json(os.path.join(args.output_dir, "train.json"),
                         orient="records")
    df[~is_train].to_json(os.path.join(args.output_dir, "val.json"),
                          orient="records")
    cloud = pd.DataFrame(
        np.concatenate([xyz, rgb], axis=1),
        columns=["x", "y", "z", "r", "g", "b"])
    cloud.to_parquet(os.path.join(args.output_dir, "point_cloud.parquet"))
    print(f"wrote {is_train.sum()} train / {(~is_train).sum()} val views, "
          f"{len(cloud)} points")


if __name__ == "__main__":
    main()
