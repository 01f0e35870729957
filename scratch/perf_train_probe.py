"""Measure the full training step (fwd + bwd + adam + controller stats) at
the benchmark workload: 430k points, 976x544. Chained timing per CLAUDE.md.

Env knobs: MK (max_keys), BIGDIV, MIDDIV, STAGES=1 to print stage breakdown.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import bench
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize_with_vjp)
from taichi_3d_gaussian_splatting_tpu.ops.sh import feature_sh_band_mask
from taichi_3d_gaussian_splatting_tpu.training.loss import (
    LossFunction, LossFunctionConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    ControllerState, update_stats)

h, w = 544, 976
intr = np.array([[581.7, 0, w / 2], [0, 581.7, h / 2], [0, 0, 1]], np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
cfg = RasterizerConfig(
    near_plane=0.4, far_plane=1000.0,
    max_tiles_per_point=32,
    big_point_divisor=int(os.environ.get("BIGDIV", "16")),
    mid_point_divisor=int(os.environ.get("MIDDIV", "4")),
    max_keys=int(os.environ.get("MK", str(2 ** 20))),
    chunk=int(os.environ.get("CHUNK", "128")))

pc, feats = bench.load_scene()
n = pc.shape[0]
invalid = jnp.zeros((n,), jnp.int8)
obj = jnp.zeros((n,), jnp.int32)
q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
t_cam = jnp.zeros((1, 3))
gt = jnp.array(np.random.default_rng(1).uniform(0, 1, (h, w, 3)),
               jnp.float32)
loss_fn = LossFunction(LossFunctionConfig())
fopt = optax.adam(1e-3)
popt = optax.adam(1e-5)
fstate = fopt.init(feats)
pstate = popt.init(pc)
ctrl = ControllerState.zeros(n)
band_mask = feature_sh_band_mask(jnp.int32(3))


@jax.jit
def step(pc, feats, fstate, pstate, ctrl):
    qn = feats[:, 0:4] / jnp.linalg.norm(feats[:, 0:4], axis=1, keepdims=True)
    feats = feats.at[:, 0:4].set(qn)
    result, vjp_fn = rasterize_with_vjp(
        pc, feats, invalid, obj, q_cam, t_cam, cam, cfg)

    def image_loss(image, features):
        img = jnp.clip(image, 0.0, 1.0)
        loss, l1, ld = loss_fn(img, gt, point_invalid_mask=invalid,
                               pointcloud_features=features)
        return loss, (l1, ld, img)

    (loss, _), (g_image, g_feats_direct) = jax.value_and_grad(
        image_loss, argnums=(0, 1), has_aux=True)(result.image, feats)
    grad_pc, grad_feats_raster, stats = vjp_fn(g_image)
    grad_feats = grad_feats_raster * band_mask + g_feats_direct
    uf, fstate = fopt.update(grad_feats, fstate, feats)
    feats = optax.apply_updates(feats, uf)
    up, pstate = popt.update(grad_pc, pstate, pc)
    pc = optax.apply_updates(pc, up)
    ctrl = update_stats(ctrl, stats, grad_pc, result.aux.in_frustum)
    return pc, feats, fstate, pstate, ctrl, loss, result.aux.key_overflow


t0 = time.perf_counter()
out = step(pc, feats, fstate, pstate, ctrl)
out[0].block_until_ready()
print(f"compile+first: {time.perf_counter() - t0:.1f}s  "
      f"key_overflow={int(out[6])}")

pc2, feats2, fstate, pstate, ctrl = out[:5]
for _ in range(3):
    pc2, feats2, fstate, pstate, ctrl, loss, _ = step(
        pc2, feats2, fstate, pstate, ctrl)
loss.block_until_ready()

REPS = 20
t0 = time.perf_counter()
for _ in range(REPS):
    pc2, feats2, fstate, pstate, ctrl, loss, _ = step(
        pc2, feats2, fstate, pstate, ctrl)
loss.block_until_ready()
ms = (time.perf_counter() - t0) / REPS * 1e3
print(f"train_step: {ms:.2f} ms  ({1000.0 / ms:.2f} it/s)  loss={float(loss):.4f}")

if os.environ.get("TRACE"):
    import shutil
    td = "/tmp/train_trace"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        for _ in range(5):
            pc2, feats2, fstate, pstate, ctrl, loss, _ = step(
                pc2, feats2, fstate, pstate, ctrl)
        loss.block_until_ready()
    print("trace written to", td)
