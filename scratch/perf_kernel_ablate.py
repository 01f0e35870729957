"""Ablate rgb-blend kernel internals to find per-chunk cost drivers (TPU).
Uses standalone pallas kernels cloned from blend_pallas with pieces removed.
"""
import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys; sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.ops.blend_pallas import (
    _lane_cumprod_exclusive, _saturation_masks, _tile_pixel_coords,
    NUM_DATA_ROWS, ROW_U, ROW_V, ROW_A, ROW_B, ROW_C, ROW_LOGW,
    PIXELS_PER_TILE)

NUM_TILES = 2074
TPR = 61
MK = 786432
CHUNK = 128


def make_kernel(mode):
    def kern(starts_ref, ends_ref, data_hbm, out_ref, chunk_buf, dma_sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        aligned_start = (start // CHUNK) * CHUNK
        num_chunks = jnp.where(end > start,
                               pl.cdiv(end - aligned_start, CHUNK), 0)
        px, py = _tile_pixel_coords(t, TPR)

        def get_dma(i):
            slot = jax.lax.rem(i, 2)
            return pltpu.make_async_copy(
                data_hbm.at[:, pl.ds(aligned_start + i * CHUNK, CHUNK)],
                chunk_buf.at[slot], dma_sem.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0).start()

        def cond(state):
            i, T, sat, acc = state
            return (i < num_chunks) & jnp.logical_not(jnp.all(sat > 0.5))

        def body(state):
            i, T, sat, acc = state
            col0 = aligned_start + i * CHUNK

            @pl.when(i + 1 < num_chunks)
            def _():
                get_dma(i + 1).start()
            get_dma(i).wait()
            data = chunk_buf[jax.lax.rem(i, 2)]

            if mode == "dma_only":
                acc = acc + jnp.sum(data[0:1, :]) * jnp.ones_like(acc)
                return (i + 1, T, sat, acc)

            dx = px - data[ROW_U:ROW_U + 1, :]
            dy = py - data[ROW_V:ROW_V + 1, :]
            exponent = ((data[ROW_A:ROW_A + 1, :] * dx
                         + data[ROW_B:ROW_B + 1, :] * dy) * dx
                        + (data[ROW_C:ROW_C + 1, :] * dy * dy
                           + data[ROW_LOGW:ROW_LOGW + 1, :]))
            if mode == "no_exp":
                a_exp = exponent
            else:
                a_exp = jnp.exp(exponent)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            gidx = col0 + lane
            in_segment = (gidx >= start) & (gidx < end)
            a_v = jnp.where(in_segment & (a_exp >= 1.0 / 255.0),
                            jnp.minimum(a_exp, 0.99), 0.0)
            one_minus = 1.0 - a_v
            if mode == "no_scan":
                T_i = T * one_minus
            else:
                T_i = T * _lane_cumprod_exclusive(one_minus, False)
            if mode == "no_sat":
                contribute = (a_v > 0).astype(jnp.float32)
                T = T_i[:, -1:]
            else:
                contribute, T, sat = _saturation_masks(
                    a_v, T_i, one_minus, T, sat)
            weight = contribute * a_v * T_i
            if mode == "no_mxu":
                acc = acc + jnp.sum(weight, axis=1, keepdims=True) * jnp.ones_like(acc)
            else:
                acc = acc + jax.lax.dot_general(
                    weight, data[8:16, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            return (i + 1, T, sat, acc)

        init = (jnp.zeros((), jnp.int32),
                jnp.ones((PIXELS_PER_TILE, 1), jnp.float32),
                jnp.zeros((PIXELS_PER_TILE, 1), jnp.float32),
                jnp.zeros((PIXELS_PER_TILE, 8), jnp.float32))
        i_final, T, _, acc = jax.lax.while_loop(cond, body, init)

        @pl.when((i_final < num_chunks) & (num_chunks > 0))
        def _():
            get_dma(i_final).wait()
        out_ref[0, :, :] = acc

    return kern


def build(mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NUM_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, PIXELS_PER_TILE, 8),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, NUM_DATA_ROWS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(
        make_kernel(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_TILES, PIXELS_PER_TILE, 8),
                                       jnp.float32))


rng = np.random.default_rng(0)
data = np.zeros((16, MK), np.float32)
data[ROW_U] = rng.uniform(0, 976, MK)
data[ROW_V] = rng.uniform(0, 544, MK)
data[ROW_A] = -0.05; data[ROW_C] = -0.05; data[ROW_LOGW] = -1.0
data[8:11] = 0.5; data[11] = 10.0; data[12] = 1.0
data_j = jnp.array(data)
KEYS = 646871
edges = np.linspace(0, KEYS, NUM_TILES + 1).astype(np.int32)
starts = jnp.array(edges[:-1]); ends = jnp.array(edges[1:])


def timeit(name, fn, iters=30):
    x0 = jnp.zeros((8,), jnp.float32)
    @jax.jit
    def wrapped(x):
        d = data_j.at[0, 0].add(x[0])
        out = fn(starts, ends, d)
        return x + out[0, 0, 0] * 0
    out = wrapped(x0); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = x0
        for _ in range(iters):
            x = wrapped(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:20s}: {dt:7.2f} ms", flush=True)


for mode in ("full", "dma_only", "no_exp", "no_scan", "no_sat", "no_mxu"):
    timeit(mode, build(mode))
