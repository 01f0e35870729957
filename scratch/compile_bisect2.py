"""Finer-grained TPU compile-time bisect: which op's backend compile scales
with the emission-buffer size?

Round-3 finding (benchmark/README.md): the full train step compiles in 15 s
on CPU but ~8 min at max_keys 2^20 / 25+ min at 2^21 on the TPU backend.
This isolates each MK-sized op and times lower() vs compile() separately.

Usage: python scratch/compile_bisect2.py <stage> <rows_log2>
  stages: sort2 | sort12 | gather_slab | searchsorted | shiftadd |
          blend_fwd | blend_bwd | binning | fwd_bwd
Each prints one line; run the matrix from a driver shell, e.g.
  for s in sort2 sort12 gather_slab searchsorted shiftadd blend_fwd blend_bwd; do
    for k in 19 20 21; do python scratch/compile_bisect2.py $s $k; done
  done
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

stage = sys.argv[1]
rows_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 20
R = 2 ** rows_log2
CHUNK = 128
NUM_TILES = 2074          # 976x544 grid (61 x 34)
TILES_PER_ROW = 61
N = 430_000


def timed_compile(fn, *args):
    t0 = time.time()
    low = jax.jit(fn).lower(*args)
    t1 = time.time()
    low.compile()
    t2 = time.time()
    print(f"{stage}[rows=2^{rows_log2}] backend={jax.default_backend()} "
          f"lower={t1 - t0:.1f}s compile={t2 - t1:.1f}s", flush=True)


rng = np.random.default_rng(0)

if stage == "sort2":
    keys = jnp.array(rng.integers(0, 2 ** 30, R, dtype=np.int32))
    ids = jnp.arange(R, dtype=jnp.int32)
    timed_compile(lambda k, i: jax.lax.sort((k, i), num_keys=1,
                                            is_stable=False), keys, ids)
elif stage == "sort12":
    keys = jnp.array(rng.integers(0, 2 ** 30, R, dtype=np.int32))
    pay = [jnp.zeros((R,), jnp.float32) + i for i in range(11)]
    timed_compile(lambda k, *p: jax.lax.sort((k, *p), num_keys=1,
                                             is_stable=False), keys, *pay)
elif stage == "gather_slab":
    rows = jnp.zeros((16, N), jnp.float32)
    idx = jnp.array(rng.integers(0, N, R, dtype=np.int32))
    timed_compile(lambda r, i: r[:, i], rows, idx)
elif stage == "searchsorted":
    keys = jnp.array(np.sort(rng.integers(0, 2 ** 30, R, dtype=np.int32)))
    bounds = jnp.arange(NUM_TILES + 1, dtype=jnp.int32) << 20
    timed_compile(lambda k, b: jnp.searchsorted(
        k, b, side="left", method="scan_unrolled"), keys, bounds)
elif stage == "shiftadd":
    sid = jnp.array(np.sort(rng.integers(0, N, R, dtype=np.int32)))
    acc0 = jnp.zeros((11, R), jnp.float32)

    def scan(sid, acc):
        shift = 1
        while shift < 256:
            same = jnp.concatenate([
                jnp.zeros((shift,), bool), sid[shift:] == sid[:-shift]])
            shifted = jnp.concatenate([
                jnp.zeros((11, shift), acc.dtype), acc[:, :-shift]], axis=1)
            acc = acc + jnp.where(same[None, :], shifted, 0.0)
            shift *= 2
        return acc
    timed_compile(scan, sid, acc0)
elif stage in ("blend_fwd", "blend_bwd"):
    from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas as BP
    data = jnp.zeros((16, R), jnp.float32)
    starts = jnp.array(rng.integers(0, R - CHUNK, NUM_TILES, dtype=np.int32))
    ends = jnp.minimum(starts + 300, R)
    if stage == "blend_fwd":
        timed_compile(lambda d, s, e: BP.blend_forward(
            d, s, e, num_tiles=NUM_TILES, tiles_per_row=TILES_PER_ROW,
            chunk=CHUNK), data, starts, ends)
    else:
        pix = jnp.zeros((NUM_TILES, 8, 256), jnp.float32)
        timed_compile(lambda d, s, e, p: BP.blend_backward(
            d, s, e, p, num_tiles=NUM_TILES, tiles_per_row=TILES_PER_ROW,
            chunk=CHUNK)[0], data, starts, ends, pix)
elif stage == "binning":
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import bin_points_to_tiles
    intr = np.array([[581.7, 0, 488], [0, 581.7, 272], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=544,
                     camera_width=976)
    u = jnp.array(rng.uniform(0, 976, N).astype(np.float32))
    v = jnp.array(rng.uniform(0, 544, N).astype(np.float32))
    depth = jnp.array(rng.uniform(1, 50, N).astype(np.float32))
    rx = jnp.array(rng.uniform(1, 40, N).astype(np.float32))
    infr = jnp.ones((N,), bool)

    def fn(u, v, d, rx):
        b = bin_points_to_tiles(
            u, v, d, rx, rx, infr, cam, max_keys=R,
            pool_slots=(4, 8, 16, 32, 64, 128, 256),
            pool_caps=(65536, 16384, 8192, 4096, 2048, 512, 128))
        return b.sorted_key, b.sorted_point_idx, b.tile_starts, b.tile_ends
    timed_compile(fn, u, v, depth, rx)
elif stage == "fwd_bwd":
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, rasterize_with_vjp)
    intr = np.array([[581.7, 0, 488], [0, 581.7, 272], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=544,
                     camera_width=976)
    cfg = RasterizerConfig(
        near_plane=0.4, far_plane=2000.0, max_keys=R,
        pool_slots=(4, 8, 16, 32, 64, 128, 256),
        pool_caps=(65536, 16384, 8192, 4096, 2048, 512, 128))
    pc = jnp.array((rng.normal(size=(N, 3)) * 2
                    + np.array([0, 0, 6])).astype(np.float32))
    feats = np.zeros((N, 56), np.float32)
    feats[:, 3] = 1.0
    feats[:, 4:7] = -3.0
    feats[:, 7] = 1.0
    feats = jnp.array(feats)
    inv = jnp.zeros((N,), jnp.int8)
    obj = jnp.zeros((N,), jnp.int32)
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t = jnp.zeros((1, 3))

    def fb(p, f):
        result, vjp_fn = rasterize_with_vjp(p, f, inv, obj, q, t, cam, cfg)
        gp, gf, _ = vjp_fn(jnp.ones_like(result.image))
        return result.image.sum() + gp.sum() + gf.sum()
    timed_compile(fb, pc, feats)
else:
    raise SystemExit(f"unknown stage {stage}")
