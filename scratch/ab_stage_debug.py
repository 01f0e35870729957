"""Stage-by-stage CPU-interpret vs TPU dump for the A/B divergence hunt.

python scratch/ab_stage_debug.py {cpu|tpu} /tmp/stage_{mode}.npz
"""
import os
import sys

mode, out_path = sys.argv[1], sys.argv[2]
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, _project_and_bin, TileGrid)
from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas as BP

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from ab_runner import make_camera, random_scene

cfg = RasterizerConfig(near_plane=0.1, far_plane=100.0, max_keys=512,
                       max_tiles_per_point=16,
                       depth_to_sort_key_scale=100.0)
cam = make_camera()
pc, feats = random_scene(60, seed=1, alpha=2.0)
n = pc.shape[0]
obj = jnp.zeros((n,), jnp.int32)
inv = jnp.zeros((n,), jnp.int8)
q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
t_cam = jnp.zeros((1, 3))


@jax.jit
def stages(pc, feats):
    attrs, cols, depth, binning = _project_and_bin(
        pc, feats, inv, obj, q_cam, t_cam, cam, cfg, None)
    grid = TileGrid.from_camera(cam)
    tile_out = BP.blend_forward(
        binning.point_data, binning.tile_starts, binning.tile_ends,
        num_tiles=grid.num_tiles, tiles_per_row=grid.tiles_per_row,
        chunk=cfg.chunk)
    return {
        "u": attrs.u, "v": attrs.v, "conic_a": attrs.conic_a,
        "conic_b": attrs.conic_b, "conic_c": attrs.conic_c,
        "alpha_act": attrs.alpha_after_activation,
        "color_r": attrs.color_r, "radii": attrs.radii,
        "in_frustum": attrs.in_frustum,
        "sorted_key": binning.sorted_key,
        "sorted_idx": binning.sorted_point_idx,
        "tile_starts": binning.tile_starts,
        "tile_ends": binning.tile_ends,
        "point_data": binning.point_data,
        "tile_out": tile_out,
    }


out = jax.device_get(stages(jnp.array(pc), jnp.array(feats)))
np.savez(out_path, **out)
print(f"[{mode}] backend={jax.default_backend()} saved {out_path}")
