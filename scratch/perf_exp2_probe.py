"""Does Mosaic lower jnp.exp2, and does prescaling the coefficient rows by
log2(e) (so the kernel calls exp2 directly on the dot output) beat exp?

exp(x) lowers to 2^(x*log2e) on the VPU, paying a (chunk, 256) multiply per
chunk. Prescaling the (8, C) coefficient rows by log2(e) (per-key cost,
256x cheaper) and calling exp2 on the dot output skips that multiply
entirely (round-3 queue, benchmark/README.md). Three variants:

  exp        a = exp(dot(coef, mono))             - production today
  exp2mul    a = exp2(dot(coef, mono) * log2e)    - lowering check only
                 (same (chunk, 256) multiply exp pays internally)
  exp2pre    a = exp2(dot(coef * log2e, mono))    - the actual candidate:
                 the multiply moves to the (8, C) rows

Run on the TPU:  python scratch/perf_exp2_probe.py
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


def make_kernel(variant):
    def kernel(coef_ref, mono_ref, out_ref):
        def body(i, acc):
            coef = coef_ref[0, :, :] + 1e-6 * i.astype(jnp.float32)
            if variant == "exp2pre":
                coef = coef * LOG2E                      # (8, C) rows
            e = jax.lax.dot_general(
                coef, mono_ref[...], (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            if variant == "exp":
                a = jnp.exp(e)
            elif variant == "exp2mul":
                a = jnp.exp2(e * LOG2E)
            else:
                a = jnp.exp2(e)
            return acc + a
        acc = jax.lax.fori_loop(
            0, N_CHUNKS, body, jnp.zeros((CHUNK, PIX), jnp.float32))
        out_ref[...] = acc
    return kernel


def run(variant):
    rng = np.random.default_rng(0)
    coef = jnp.array(rng.normal(size=(1, 8, CHUNK)).astype(np.float32) * 0.1)
    mono = jnp.array(rng.normal(size=(PIX, 8)).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(variant),
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
    print(f"{variant}: {dt * 1e3:.3f} ms for {N_CHUNKS} chunks "
          f"({per_chunk_ns:.0f} ns/chunk)", flush=True)
    return out


if __name__ == "__main__":
    a = run("exp")
    b = run("exp2mul")
    c = run("exp2pre")
    for name, x in (("exp2mul", b), ("exp2pre", c)):
        rel = float(jnp.max(jnp.abs(a - x) /
                            jnp.maximum(jnp.abs(a), 1e-20)))
        print(f"max rel diff exp vs {name}: {rel:.2e}")
