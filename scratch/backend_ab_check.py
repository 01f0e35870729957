"""Compiled-TPU vs CPU-interpret A/B check for the full rasterizer+VJP.

Run `python scratch/backend_ab_check.py cpu` then `... tpu`, then compare the
two .npz files (all outputs should agree to ~1e-5 relative). This is the
cross-backend exactness gate: it catches bf16-matmul drift, Mosaic lowering
differences, and saturation-threshold flips.
"""

import os, sys, time
import numpy as np
mode = sys.argv[1]
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig, rasterize_with_vjp

def make_camera(w=32, h=32, f=25.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return CameraInfo(camera_intrinsics=K, camera_height=h, camera_width=w)

def random_scene(n, seed=0, alpha=2.0):
    rng = np.random.default_rng(seed)
    # tie-free depths: one point per 0.05-unit stratum (5 sort-key buckets
    # at the default depth_to_sort_key_scale=100), jittered WITHIN the
    # stratum - equal quantized keys blend in backend-dependent order
    # (unstable sort, same as the reference's torch.sort; CLAUDE.md)
    z = 1.0 + 0.05 * rng.permutation(n) + rng.uniform(0.005, 0.045, n)
    pc = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                         z[:, None]], axis=1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)); feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.0, (n, 3))
    feats[:, 7] = alpha + rng.normal(size=n)
    feats[:, 8:56] = 0.3 * rng.normal(size=(n, 48)); feats[:, 8] += 1.0
    return pc, feats

# divisors 1: pools hold every point. Exactness fixtures must be
# overflow-free - WHICH points survive pool overflow is backend-dependent
# (unstable category sort), same for key ties (CLAUDE.md)
CFG = RasterizerConfig(near_plane=0.1, far_plane=100.0, max_keys=512,
                       max_tiles_per_point=16,
                       mid_point_divisor=1, big_point_divisor=1)
cam = make_camera()
out = {}
for seed, alpha, label in [(1, 2.0, "a"), (2, 7.0, "b")]:
    pc, feats = random_scene(60, seed=seed, alpha=alpha)
    n = pc.shape[0]
    obj = jnp.zeros((n,), jnp.int32); inv = jnp.zeros((n,), jnp.int8)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]]); t_cam = jnp.zeros((1, 3))
    t0=time.time()
    result, vjp_fn = rasterize_with_vjp(jnp.array(pc), jnp.array(feats), inv, obj, q_cam, t_cam, cam, CFG)
    rng = np.random.default_rng(9)
    g_img = jnp.array(rng.normal(size=(32, 32, 3)).astype(np.float32))
    gp, gf, stats = vjp_fn(g_img)
    jax.block_until_ready((result.image, gp, gf))
    print(label, "time", time.time()-t0, flush=True)
    out[f"{label}_img"] = np.asarray(result.image)
    out[f"{label}_count"] = np.asarray(result.pixel_valid_point_count)
    out[f"{label}_gp"] = np.asarray(gp)
    out[f"{label}_gf"] = np.asarray(gf)
    out[f"{label}_mag"] = np.asarray(stats.magnitude_grad_viewspace)
    out[f"{label}_npix"] = np.asarray(stats.num_affected_pixels)
np.savez(f"/tmp/ab_{mode}.npz", **out)
print("saved", mode)
