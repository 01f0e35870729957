"""Binning sub-stage costs at inference budgets (TPU)."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")

N = 430_000
EM_CAP = 4 * N + 32 * (N // 16)  # 2.58M
EM_CAP = ((EM_CAP + 127) // 128) * 128
MK = 786432

rng = np.random.default_rng(0)
keys = rng.integers(0, 2**30, EM_CAP).astype(np.int32)
ids = rng.integers(0, N, EM_CAP).astype(np.int32)
pos = rng.integers(0, 2**30, EM_CAP).astype(np.int32)
keys_j, ids_j, pos_j = jnp.array(keys), jnp.array(ids), jnp.array(pos)
flagN = jnp.array(rng.integers(0, 2, N).astype(np.int32))
table = jnp.array(rng.random((16, N)).astype(np.float32))
idxMK = jnp.array(rng.integers(0, N, MK).astype(np.int32))
sorted_keys = jnp.sort(keys_j)[:MK]
boundaries = jnp.arange(2075, dtype=jnp.int32) * (2**19)


def timeit(name, fn, arg, iters=30):
    out = fn(arg); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = arg
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s}: {dt:7.2f} ms", flush=True)


@jax.jit
def sort2(x):
    k = keys_j + x[0].astype(jnp.int32) * 0
    s = jax.lax.sort((k, ids_j), num_keys=1, is_stable=True)
    return x + s[0][0].astype(jnp.float32) * 0

@jax.jit
def sort2_unstable(x):
    k = keys_j + x[0].astype(jnp.int32) * 0
    s = jax.lax.sort((k, ids_j), num_keys=1, is_stable=False)
    return x + s[0][0].astype(jnp.float32) * 0

@jax.jit
def sort1(x):
    k = keys_j + x[0].astype(jnp.int32) * 0
    s = jax.lax.sort((k,), num_keys=1, is_stable=True)
    return x + s[0][0].astype(jnp.float32) * 0

@jax.jit
def sort3(x):
    k = keys_j + x[0].astype(jnp.int32) * 0
    s = jax.lax.sort((k, ids_j, pos_j), num_keys=1, is_stable=True)
    return x + s[0][0].astype(jnp.float32) * 0

@jax.jit
def flagsortN(x):
    f = flagN + x[0].astype(jnp.int32) * 0
    s = jax.lax.sort((f, jnp.arange(N, dtype=jnp.int32)), num_keys=1,
                     is_stable=True)
    return x + s[1][0].astype(jnp.float32) * 0

@jax.jit
def gatherMK(x):
    t = table + x[0] * 0
    out = t[:, idxMK]
    return x + out[0, 0] * 0

@jax.jit
def searchsorted_tiles(x):
    k = sorted_keys + x[0].astype(jnp.int32) * 0
    e = jnp.searchsorted(k, boundaries, side="left",
                         method="scan_unrolled").astype(jnp.int32)
    return x + e[0].astype(jnp.float32) * 0

x0 = jnp.zeros((8,), jnp.float32)
timeit(f"sort {EM_CAP/1e6:.2f}M x2 stable", sort2, x0)
timeit(f"sort {EM_CAP/1e6:.2f}M x2 unstable", sort2_unstable, x0)
timeit(f"sort {EM_CAP/1e6:.2f}M x1 stable", sort1, x0)
timeit(f"sort {EM_CAP/1e6:.2f}M x3 stable", sort3, x0)
timeit("flag sort N x2", flagsortN, x0)
timeit(f"gather (16, {MK/1e6:.2f}M)", gatherMK, x0)
timeit("searchsorted 2075 boundaries", searchsorted_tiles, x0)
