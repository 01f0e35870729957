"""Stage-level timing of the inference path at bench budgets (TPU).

Each stage is timed with chained calls (data dependency) per CLAUDE.md.
"""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, _project_and_bin, TileGrid, rasterize)
from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas as BP

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

MK = int(sys.argv[1]) if len(sys.argv) > 1 else 786432
cfg = RasterizerConfig(near_plane=0.4, far_plane=1000.0,
                       max_tiles_per_point=32, big_point_divisor=16,
                       max_keys=MK, rgb_only=True)
grid = TileGrid.from_camera(cam)


def timeit(name, fn, arg, iters=30):
    out = fn(arg); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = arg
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s}: {dt:7.2f} ms", flush=True)
    return out


@jax.jit
def full(p):
    out = rasterize(p, feats_j, inv, obj, q_cam, t_cam, cam, cfg).image
    return p + out[0, 0, 0] * 0

# projection only
from taichi_3d_gaussian_splatting_tpu.ops.projection import compute_point_attributes
from taichi_3d_gaussian_splatting_tpu.ops.transforms import inverse_SE3_qt

@jax.jit
def proj_only(p):
    q_c, t_c = inverse_SE3_qt(q_cam, t_cam)
    attrs = compute_point_attributes(p, feats_j, inv, obj, q_c, t_c, t_cam,
                                     cam, cfg.near_plane, cfg.far_plane, None)
    return p + attrs.u[0] * 0

@jax.jit
def proj_bin(p):
    attrs, cols, depth, binning = _project_and_bin(
        p, feats_j, inv, obj, q_cam, t_cam, cam, cfg, None)
    return p + binning.point_data[0, 0] * 0

# blend only (fixed slab)
_, _, _, b0 = jax.jit(lambda p: _project_and_bin(
    p, feats_j, inv, obj, q_cam, t_cam, cam, cfg, None))(pc_j)
pd0 = jax.block_until_ready(b0.point_data)
ts, te = b0.tile_starts, b0.tile_ends
print("keys:", int(jnp.sum(te - ts)), "MK:", pd0.shape[1], flush=True)

@jax.jit
def blend_only(x):
    pd = pd0.at[0, 0].add(x[0, 0] * 1e-20)
    out = BP.blend_forward_rgb(pd, ts, te, num_tiles=grid.num_tiles,
                               tiles_per_row=grid.tiles_per_row, chunk=cfg.chunk)
    return x + out[0, 0, 0] * 0

timeit("full rasterize (rgb_only)", full, pc_j)
timeit("projection only", proj_only, pc_j)
timeit("projection+binning(payload)", proj_bin, pc_j)
timeit("blend_forward_rgb (flipped)", blend_only, pc_j)
