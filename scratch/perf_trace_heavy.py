"""Per-op trace of the heavy bench at reference scale (round 5).

Usage (TPU):  BENCH_POINTS=2080000 python scratch/perf_trace_heavy.py [n]
Then:         python scratch/trace_analysis.py /tmp/heavy_trace <n>

Same workload as `BENCH_SCENE_KIND=heavy BENCH_POINTS=... BENCH_TRAIN=0
python bench.py` (heavy-tailed synthetic checkpoint, scene-derived
budgets, rgb_only render) so the per-op table attributes the recorded
heavy FPS (12.9 @2.08M / 30.13 @1.03M in rounds 4-5).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("BENCH_SCENE_KIND", "heavy")
os.environ.setdefault("BENCH_POINTS", "2080000")
import numpy as np
import jax
import jax.numpy as jnp
import bench
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops.capacity import auto_capacity_config
from taichi_3d_gaussian_splatting_tpu.utils import device_lock

n_chained = int(sys.argv[1]) if len(sys.argv) > 1 else 10

if not device_lock.acquire():
    raise SystemExit(f"chip busy: pid {device_lock.holder()}")

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
for _ in range(3):
    p, img = fwd(p, feats)
img.block_until_ready()

t0 = time.perf_counter()
with jax.profiler.trace("/tmp/heavy_trace"):
    p = pc
    for _ in range(n_chained):
        p, img = fwd(p, feats)
    img.block_until_ready()
dt = (time.perf_counter() - t0) / n_chained * 1e3
print(f"chained frame time: {dt:.2f} ms over {n_chained} frames", flush=True)
device_lock.release()
