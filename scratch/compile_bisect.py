"""Bisect the pathological TPU compile time of the train step.

The full cached train step at campaign scale (240k pool, 240x128 image,
max_keys 2^21) compiles in 15 s on the CPU backend but ~26+ min on the TPU
backend. This script times compile of each pipeline piece on the current
backend to find the slow pass.

Usage: python scratch/compile_bisect.py <stage> [max_keys_log2]
  stages: fwd_rgb | fwd | fwd_bwd | step_no_raster | ssim | routing
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

stage = sys.argv[1]
mk_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 21

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize, rasterize_with_vjp)

H, W = 128, 240      # campaign /4 shape (cropped to 16)
N = 240_000
intr = np.array([[145.4, 0, W / 2], [0, 145.4, H / 2], [0, 0, 1]],
                np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
cfg = RasterizerConfig(near_plane=0.4, far_plane=2000.0,
                       depth_to_sort_key_scale=10.0, max_tiles_per_point=32,
                       big_point_divisor=8, mid_point_divisor=2,
                       max_keys=2 ** mk_log2,
                       rgb_only=(stage == "fwd_rgb"))
rng = np.random.default_rng(0)
pc = jnp.array((rng.normal(size=(N, 3)) * 2
                + np.array([0, 0, 6])).astype(np.float32))
feats = np.zeros((N, 56), np.float32)
feats[:, 3] = 1.0
feats[:, 4:7] = -3.0
feats[:, 7] = 1.0
feats[:, 8] = 1.0
feats = jnp.array(feats)
inv = jnp.zeros((N,), jnp.int8)
obj = jnp.zeros((N,), jnp.int32)
q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
t = jnp.zeros((1, 3))


def timed_compile(fn, *args):
    t0 = time.time()
    low = jax.jit(fn).lower(*args)
    t1 = time.time()
    comp = low.compile()
    t2 = time.time()
    print(f"{stage}[mk=2^{mk_log2}] backend={jax.default_backend()} "
          f"lower={t1 - t0:.1f}s compile={t2 - t1:.1f}s", flush=True)
    return comp


if stage in ("fwd", "fwd_rgb"):
    timed_compile(lambda p, f: rasterize(p, f, inv, obj, q, t, cam, cfg
                                         ).image, pc, feats)
elif stage == "fwd_bwd":
    def fb(p, f):
        result, vjp_fn = rasterize_with_vjp(p, f, inv, obj, q, t, cam, cfg)
        gp, gf, stats = vjp_fn(jnp.ones_like(result.image))
        return result.image.sum() + gp.sum() + gf.sum()
    timed_compile(fb, pc, feats)
elif stage == "ssim":
    from taichi_3d_gaussian_splatting_tpu.training.ssim import ssim
    a = jnp.zeros((H, W, 3))
    timed_compile(lambda x, y: ssim(x, y), a, a + 0.5)
elif stage == "step_no_raster":
    # everything in the train step EXCEPT the rasterizer: loss + both adams
    import optax
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunction, LossFunctionConfig)
    loss_fn = LossFunction(LossFunctionConfig())
    fopt = optax.adam(1e-3)
    popt = optax.adam(1e-5)
    fstate = fopt.init(feats)
    pstate = popt.init(pc)
    gt = jnp.zeros((H, W, 3))

    def step(p, f, fs, ps):
        img = jnp.zeros((H, W, 3)) + f[:3, :3].sum()
        loss, _, _ = loss_fn(jnp.clip(img, 0, 1), gt,
                             point_invalid_mask=inv,
                             pointcloud_features=f)
        gf = jax.grad(lambda ff: loss_fn(
            jnp.clip(jnp.zeros((H, W, 3)) + ff[:3, :3].sum(), 0, 1), gt,
            point_invalid_mask=inv, pointcloud_features=ff)[0])(f)
        uf, fs = fopt.update(gf, fs, f)
        f = optax.apply_updates(f, uf)
        up, ps = popt.update(jnp.zeros_like(p), ps, p)
        p = optax.apply_updates(p, up)
        return loss, p, f, fs, ps
    timed_compile(step, pc, feats, fstate, pstate)
else:
    raise SystemExit(f"unknown stage {stage}")
