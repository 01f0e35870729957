import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig, rasterize, rasterize_with_vjp

H, W = 544, 976
N = 430_000
rng = np.random.default_rng(0)
pc = np.stack([rng.uniform(-30, 30, N), rng.uniform(-20, 20, N), rng.uniform(2, 60, N)], 1).astype(np.float32)
feats = np.zeros((N, 56), np.float32)
q = rng.normal(size=(N, 4)); feats[:, 0:4] = (q / np.linalg.norm(q, axis=1, keepdims=True))
feats[:, 4:7] = rng.uniform(-3.5, -2.0, (N, 3)); feats[:, 7] = rng.normal(size=N)
feats[:, 8] = rng.normal(size=N); feats[:, 24] = rng.normal(size=N); feats[:, 40] = rng.normal(size=N)
intr = np.array([[600.0, 0, W/2], [0, 600.0, H/2], [0, 0, 1]], np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
obj = jnp.zeros((N,), jnp.int32); inv = jnp.zeros((N,), jnp.int8)
q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]]); t_cam = jnp.zeros((1, 3))
pc_j, feats_j = jnp.array(pc), jnp.array(feats)

def chained(name, fn, iters=20):
    out = fn(pc_j); jax.block_until_ready(out)
    for trial in range(2):
        t0 = time.time(); p = pc_j
        for _ in range(iters):
            out = fn(p); p = pc_j + out * 0
        jax.block_until_ready(out)
        dt = (time.time()-t0)/iters*1000
    print(f"{name}: {dt:.2f} ms", flush=True)

for chunk in (128, 256):
    cfg = RasterizerConfig(near_plane=0.4, far_plane=1000.0, chunk=chunk)
    f1 = jax.jit(lambda p, c=cfg: rasterize(p, feats_j, inv, obj, q_cam, t_cam, cam, c).image[0,0,0])
    chained(f"fwd chunk={chunk}", f1)
    def f3(p, c=cfg):
        result, vjp_fn = rasterize_with_vjp(p, feats_j, inv, obj, q_cam, t_cam, cam, c)
        gp, gf, stats = vjp_fn(jnp.ones_like(result.image))
        return gp[0, 0]
    chained(f"fwd+bwd chunk={chunk}", jax.jit(f3), iters=10)
