"""Isolate blend kernel cost components: per-tile grid overhead vs per-chunk
compute (TPU)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas as BP

NUM_TILES = 2074          # 976x544 -> 61 x 34
TPR = 61
MK = 786432


def timeit(name, fn, arg, iters=30):
    out = fn(arg); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = arg
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s}: {dt:7.2f} ms", flush=True)


rng = np.random.default_rng(0)
data = np.zeros((16, MK), np.float32)
data[BP.ROW_U] = rng.uniform(0, 976, MK)
data[BP.ROW_V] = rng.uniform(0, 544, MK)
data[BP.ROW_A] = -0.05    # pre-scaled conic
data[BP.ROW_B] = 0.0
data[BP.ROW_C] = -0.05
data[BP.ROW_LOGW] = -1.0
data[BP.ROW_R] = 0.5
data[BP.ROW_G] = 0.5
data[BP.ROW_B_COL] = 0.5
data[BP.ROW_DEPTH] = 10.0
data[BP.ROW_ONE] = 1.0
data_j = jnp.array(data)

KEYS = 646871
# uniform spread: ~312 keys per tile
edges = np.linspace(0, KEYS, NUM_TILES + 1).astype(np.int32)
starts_u = jnp.array(edges[:-1]); ends_u = jnp.array(edges[1:])
# empty segments: pure grid overhead
starts_0 = jnp.zeros((NUM_TILES,), jnp.int32)
ends_0 = jnp.zeros((NUM_TILES,), jnp.int32)
# single chunk per tile (128 keys each)
starts_1 = jnp.arange(NUM_TILES, dtype=jnp.int32) * 128
ends_1 = starts_1 + 128


def make(sts, ens):
    @jax.jit
    def f(x):
        d = data_j.at[0, 0].add(x[0])
        out = BP.blend_forward_rgb(d, sts, ens, num_tiles=NUM_TILES,
                                   tiles_per_row=TPR, chunk=128)
        return x + out[0, 0, 0] * 0
    return f

x0 = jnp.zeros((8,), jnp.float32)
timeit("rgb blend: empty segments (grid ovh)", make(starts_0, ends_0), x0)
timeit("rgb blend: 1 chunk/tile (2074 ch)", make(starts_1, ends_1), x0)
timeit("rgb blend: uniform 647k keys (~7k ch)", make(starts_u, ends_u), x0)
