"""Offline renderer CLI (reference: gaussian_point_render.py).

Loads one or more scene parquets (merged with per-object ids, reference:
:68-98), renders every camera pose from either a dataset JSON or a saved
tensor of 4x4 poses (.pt or .npy), and writes PNG frames.
"""

import argparse
import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class RenderConfig:
    """reference: gaussian_point_render.py:22-37 (defaults included)."""
    parquet_path_list: list
    trajectory_path: str = ""
    dataset_json_path: str = ""
    output_prefix: str = "render"
    image_width: int = 976
    image_height: int = 544
    fx: float = 581.743
    fy: float = 581.743
    cx: float = 488.0
    cy: float = 272.0


def load_poses(config: RenderConfig):
    """4x4 T_pointcloud_camera poses from .pt/.npy tensor or dataset JSON."""
    if config.trajectory_path:
        if config.trajectory_path.endswith(".pt"):
            import torch
            poses = torch.load(config.trajectory_path,
                               map_location="cpu", weights_only=False)
            poses = np.asarray(poses, np.float32)
        else:
            poses = np.load(config.trajectory_path).astype(np.float32)
        return poses.reshape(-1, 4, 4), None
    assert config.dataset_json_path, "need --trajectory_path or --dataset_json_path"
    import pandas as pd
    df = pd.read_json(config.dataset_json_path, orient="records")
    poses = np.stack([np.array(p, np.float32).reshape(4, 4)
                      for p in df["T_pointcloud_camera"]])
    intrinsics = np.stack([np.array(k, np.float32).reshape(3, 3)
                           for k in df["camera_intrinsics"]])
    return poses, intrinsics


def merge_scenes(parquet_paths):
    """Concatenate scenes, assigning point_object_id per source
    (reference: :68-98)."""
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.models.scene import (
        GaussianPointCloudScene)
    pcs, feats, objs = [], [], []
    for i, path in enumerate(parquet_paths):
        scene = GaussianPointCloudScene.from_parquet(path).spatially_sorted()
        keep = np.asarray(scene.point_invalid_mask) == 0
        pcs.append(np.asarray(scene.point_cloud)[keep])
        feats.append(np.asarray(scene.point_cloud_features)[keep])
        objs.append(np.full((keep.sum(),), i, np.int32))
    pc = np.concatenate(pcs)
    f = np.concatenate(feats)
    o = np.concatenate(objs)
    invalid = np.zeros((pc.shape[0],), np.int8)
    if pc.shape[0] == 0:
        # all-pruned scenes render black instead of breaking static shapes
        pc = np.zeros((1, 3), np.float32)
        f = np.zeros((1, 56), np.float32)
        o = np.zeros((1,), np.int32)
        invalid = np.ones((1,), np.int8)
    return (jnp.asarray(pc), jnp.asarray(f),
            jnp.asarray(invalid), jnp.asarray(o),
            len(parquet_paths))


def main():
    import jax
    import jax.numpy as jnp
    import PIL.Image
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, rasterize)
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
        SE3_to_quaternion_and_translation)

    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path", type=str, nargs="+", required=True)
    parser.add_argument("--trajectory_path", type=str, default="")
    parser.add_argument("--dataset_json_path", type=str, default="")
    parser.add_argument("--output_prefix", type=str, default="render")
    parser.add_argument("--width", type=int, default=976)
    parser.add_argument("--height", type=int, default=544)
    parser.add_argument("--fx", type=float, default=581.743)
    parser.add_argument("--fy", type=float, default=581.743)
    parser.add_argument("--portrait_mode", action="store_true", default=False)
    args = parser.parse_args()

    if args.portrait_mode:
        # swap to 544x976 with doubled focal length
        # (reference: gaussian_point_render.py:32-37,145-146)
        args.width, args.height = args.height, args.width
        args.fx *= 2.0
        args.fy *= 2.0
    config = RenderConfig(parquet_path_list=args.parquet_path,
                          trajectory_path=args.trajectory_path,
                          dataset_json_path=args.dataset_json_path,
                          output_prefix=args.output_prefix,
                          image_width=args.width, image_height=args.height,
                          fx=args.fx, fy=args.fy)
    poses, per_view_intrinsics = load_poses(config)
    pc, feats, invalid, obj, num_objects = merge_scenes(
        config.parquet_path_list)

    w = config.image_width - config.image_width % 16
    h = config.image_height - config.image_height % 16
    base_intr = np.array([[config.fx, 0, w / 2], [0, config.fy, h / 2],
                          [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=base_intr, camera_height=h,
                     camera_width=w)
    # capacity budgets derived from the scene: probe up to 8 evenly-spaced
    # trajectory poses (projection-only, cheap) and size the tiers with 50%
    # headroom instead of hard-coding max_keys (ops/capacity.py)
    from taichi_3d_gaussian_splatting_tpu.ops.capacity import (
        auto_capacity_config)
    raster_cfg = RasterizerConfig(rgb_only=True, max_tiles_per_point=64)
    probe_views = []
    for pose in poses[::max(len(poses) // 8, 1)][:8]:
        q, t = SE3_to_quaternion_and_translation(jnp.asarray(pose)[None])
        probe_views.append((jnp.tile(q[0:1], (num_objects, 1)),
                            jnp.tile(t[0:1], (num_objects, 1))))
    raster_cfg = auto_capacity_config(pc, feats, invalid, obj, probe_views,
                                      cam, raster_cfg, headroom=1.5)

    @jax.jit
    def render_one(q, t, intr):
        cam_i = dataclasses.replace(cam, camera_intrinsics=intr)
        result = rasterize(pc, feats, invalid, obj,
                           jnp.tile(q, (num_objects, 1)),
                           jnp.tile(t, (num_objects, 1)), cam_i, raster_cfg)
        return jnp.clip(result.image, 0.0, 1.0)

    os.makedirs(os.path.dirname(config.output_prefix) or ".", exist_ok=True)
    for i, pose in enumerate(poses):
        q, t = SE3_to_quaternion_and_translation(jnp.asarray(pose)[None])
        intr = (per_view_intrinsics[i] if per_view_intrinsics is not None
                else base_intr)
        img = render_one(q[0:1], t[0:1], jnp.asarray(intr))
        out_path = f"{config.output_prefix}_{i:05d}.png"
        PIL.Image.fromarray(
            (np.asarray(img) * 255).astype(np.uint8)).save(out_path)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
