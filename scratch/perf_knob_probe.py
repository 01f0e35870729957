"""Knob sweep: chunk size, max_keys, sort stability (TPU)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize)

H, W = 544, 976
N = 430_000
rng = np.random.default_rng(0)
pc = np.stack([rng.uniform(-30, 30, N), rng.uniform(-20, 20, N), rng.uniform(2, 60, N)], 1).astype(np.float32)
feats = np.zeros((N, 56), np.float32)
q = rng.normal(size=(N, 4)); feats[:, 0:4] = (q / np.linalg.norm(q, axis=1, keepdims=True))
feats[:, 4:7] = rng.uniform(-3.5, -2.0, (N, 3)); feats[:, 7] = rng.normal(size=N)
feats[:, 8] = rng.normal(size=N); feats[:, 24] = rng.normal(size=N); feats[:, 40] = rng.normal(size=N)
intr = np.array([[581.7, 0, W/2], [0, 581.7, H/2], [0, 0, 1]], np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
obj = jnp.zeros((N,), jnp.int32); inv = jnp.zeros((N,), jnp.int8)
q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]]); t_cam = jnp.zeros((1, 3))
pc_j, feats_j = jnp.array(pc), jnp.array(feats)


def timeit(name, fn, arg, iters=30):
    out = fn(arg); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = arg
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s}: {dt:7.2f} ms", flush=True)


for chunk in (128, 256, 512):
    for mk in (2 ** 20, 786432):
        cfg = RasterizerConfig(near_plane=0.4, far_plane=1000.0,
                               max_tiles_per_point=32, big_point_divisor=16,
                               max_keys=mk, chunk=chunk, rgb_only=True)
        @jax.jit
        def full(p, c=cfg):
            out = rasterize(p, feats_j, inv, obj, q_cam, t_cam, cam, c).image
            return p + out[0, 0, 0] * 0
        timeit(f"full chunk={chunk} mk={mk}", full, pc_j)
