"""Round-3 perf attribution: trace the rgb_only render at bench scale.

Usage (TPU):  python scratch/perf_r3_trace.py [n_chained]
Then:         python scratch/trace_analysis.py /tmp/r3_trace <n_chained>

Replicates bench.py's exact workload (430k uniform scene, 976x544,
auto-capacity budgets at 1.1 headroom) so the per-op table attributes the
bench's frame time.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import bench
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.capacity import auto_capacity_config

n_chained = int(sys.argv[1]) if len(sys.argv) > 1 else 20

h, w = 544, 976
intr = np.array([[581.7, 0, w / 2], [0, 581.7, h / 2], [0, 0, 1]], np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
cfg = RasterizerConfig(near_plane=0.4, far_plane=1000.0,
                       max_tiles_per_point=32, rgb_only=True)
pc, feats = bench.load_scene()
n = pc.shape[0]
invalid = jnp.zeros((n,), jnp.int8)
obj = jnp.zeros((n,), jnp.int32)
q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
t_cam = jnp.zeros((1, 3))
cfg = auto_capacity_config(pc, feats, invalid, obj, [(q_cam, t_cam)], cam,
                           cfg, headroom=1.1)
print("budgets: max_keys", cfg.max_keys, "pool_slots", cfg.pool_slots,
      "pool_caps", cfg.pool_caps, flush=True)


@jax.jit
def fwd(p, f):
    img = rasterize(p, f, invalid, obj, q_cam, t_cam, cam, cfg).image
    return p + img[0, 0, 0] * 0, img


p, img = fwd(pc, feats)
img.block_until_ready()
for _ in range(5):
    p, img = fwd(p, feats)
img.block_until_ready()

trace_dir = os.environ.get("TRACE_DIR", "/tmp/r3_trace")
t0 = time.perf_counter()
with jax.profiler.trace(trace_dir):
    p = pc
    for _ in range(n_chained):
        p, img = fwd(p, feats)
    img.block_until_ready()
dt = (time.perf_counter() - t0) / n_chained * 1e3
print(f"chained frame time: {dt:.2f} ms over {n_chained} frames", flush=True)
