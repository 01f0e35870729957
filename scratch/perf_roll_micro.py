"""Micro-bench: lane-roll scan vs sublane-roll scan vs exp, inside pallas.
Each program owns a distinct block (prevents hoisting); REPS inner loop
iterations chain on the block value.
"""
import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_PROGRAMS = 256
REPS = 300  # chunk-equivalents per program


def make_kernel(mode):
    def kern(x_ref, out_ref):
        x = x_ref[0]

        def body(i, acc):
            if mode.startswith("lane"):
                a = acc
                k = 1
                while k < 128:
                    rolled = pltpu.roll(a, k, 1)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, a.shape[1]), 1)
                    a = a * jnp.where(lane < k, jnp.ones_like(a), rolled)
                    k *= 2
                return a
            if mode.startswith("sub"):
                a = acc
                k = 1
                while k < 128:
                    rolled = pltpu.roll(a, k, 0)
                    row = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0], 1), 0)
                    a = a * jnp.where(row < k, jnp.ones_like(a), rolled)
                    k *= 2
                return a
            if mode == "exp":
                return jnp.exp(acc * 0.999) * 0.5
            if mode == "mul7":
                a = acc
                for _ in range(7):
                    a = a * 0.9999 + 1e-6
                return a
            if mode == "mxu":
                return acc * 1e-3 + jax.lax.dot_general(
                    acc[:, 0:8], acc[0:8, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) * 1e-6
            if mode == "mxu_t":
                # transposed-lhs contraction: (8, A) coef vs (B, 8) mono
                return acc * 1e-3 + jax.lax.dot_general(
                    acc[0:8, :], acc[:, 0:8],
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).T[
                        : acc.shape[0], : acc.shape[1]] * 1e-6
            raise ValueError(mode)

        acc = jax.lax.fori_loop(0, REPS, body, x)
        out_ref[0] = acc
    return kern


def build(mode, shape):
    return pl.pallas_call(
        make_kernel(mode),
        grid=(NUM_PROGRAMS,),
        in_specs=[pl.BlockSpec((1,) + shape, lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + shape, lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUM_PROGRAMS,) + shape, jnp.float32),
    )


def timeit(name, mode, shape, iters=20):
    x0 = jnp.full((NUM_PROGRAMS,) + shape, 0.9999, jnp.float32)
    pcall = build(mode, shape)
    fn = jax.jit(lambda x: pcall(x) * 0.5 + 0.5)
    out = fn(x0); jax.block_until_ready(out)
    t0 = time.perf_counter(); x = x0
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters * 1000
    per = dt / NUM_PROGRAMS / REPS * 1000
    print(f"{name:28s}: {dt:7.2f} ms  ({per:6.3f} us/chunk-equiv)", flush=True)


timeit("noop mul7 (256,128)", "mul7", (256, 128))
timeit("lane-roll scan (256,128)", "lane", (256, 128))
timeit("sublane-roll scan (128,256)", "sub", (128, 256))
timeit("exp (256,128)", "exp", (256, 128))
timeit("exp (128,256)", "exp", (128, 256))
timeit("mxu (256,8)x(8,128) f32", "mxu", (256, 128))
