"""Does Mosaic lower jnp.exp2, and is exp2(prescaled-coef dot) faster than
exp(dot) in the blend's inner loop?

exp(x) lowers to 2^(x*log2e) on the VPU, paying a (chunk, 256) multiply per
chunk. Prescaling the (8, C) coefficient rows by log2(e) (per-key cost,
256x cheaper) and calling exp2 directly should skip it (round-3 queue,
benchmark/README.md). Run on the TPU:

  python scratch/perf_exp2_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

CHUNK = 128
PIX = 256
N_CHUNKS = 4096          # ~ bench workload's chunk count per frame
LOG2E = float(np.log2(np.e))


def make_kernel(use_exp2):
    def kernel(coef_ref, mono_ref, out_ref):
        def body(i, acc):
            coef = coef_ref[0, :, :] + 1e-6 * i.astype(jnp.float32)
            e = jax.lax.dot_general(
                coef, mono_ref[...], (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            a = jnp.exp2(e * LOG2E) if use_exp2 else jnp.exp(e)
            return acc + a
        acc = jax.lax.fori_loop(
            0, N_CHUNKS, body, jnp.zeros((CHUNK, PIX), jnp.float32))
        out_ref[...] = acc
    return kernel


def run(use_exp2):
    rng = np.random.default_rng(0)
    coef = jnp.array(rng.normal(size=(1, 8, CHUNK)).astype(np.float32) * 0.1)
    mono = jnp.array(rng.normal(size=(PIX, 8)).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(use_exp2),
        out_shape=jax.ShapeDtypeStruct((CHUNK, PIX), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def chained(c, m):
        out = f(c, m)
        return c + out[0, 0] * 0, out

    c = coef
    c, out = chained(c, mono)
    out.block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        c, out = chained(c, mono)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    per_chunk_ns = dt / N_CHUNKS * 1e9
    name = "exp2" if use_exp2 else "exp"
    print(f"{name}: {dt * 1e3:.3f} ms for {N_CHUNKS} chunks "
          f"({per_chunk_ns:.0f} ns/chunk)", flush=True)
    return out


if __name__ == "__main__":
    a = run(False)
    b = run(True)
    rel = float(jnp.max(jnp.abs(a - b) / jnp.maximum(jnp.abs(a), 1e-20)))
    print(f"max rel diff exp vs exp2: {rel:.2e}")
