"""Ablate the CURRENT rgb forward kernel internals (TPU): which per-chunk
stage dominates? Modes strip stages cumulatively; numbers are ms/frame on
the real bench workload layout (auto-capacity budgets, 430k scene)."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.ops.blend_pallas import (  # noqa: E402
    _chunk_alpha, _saturation_masks, _sub_cumprod_exclusive, _tile_mono,
    _tile_origin, NUM_DATA_ROWS, PIXELS_PER_TILE, _DOT)

CHUNK = 128


def make_kernel(mode, tiles_per_row):
    def kern(starts_ref, ends_ref, data_hbm, out_ref, chunk_buf, dma_sem):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        aligned_start = (start // CHUNK) * CHUNK
        num_chunks = jnp.where(end > start,
                               pl.cdiv(end - aligned_start, CHUNK), 0)
        mono, _, _ = _tile_mono(t, tiles_per_row)
        tcx, tcy = _tile_origin(t, tiles_per_row)

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
                acc = acc + data[8:16, :] @ jnp.ones(
                    (CHUNK, PIXELS_PER_TILE), jnp.float32)
                return (i + 1, T, sat, acc)

            a_exp, a_v, _, _, _, gidx = _chunk_alpha(
                data, mono, tcx, tcy, start, end, col0, CHUNK)
            one_minus = 1.0 - a_v
            if mode == "no_scan":
                T_i = T * one_minus  # WRONG result, same shapes
            else:
                T_i = T * _sub_cumprod_exclusive(one_minus, False)
            if mode == "no_sat":
                contribute = a_v
                T = T_i[-1:, :]
            else:
                contribute, T, sat = _saturation_masks(
                    a_v, T_i, one_minus, T, sat)
            weight = contribute * a_v * T_i
            slab = data[8:16, :]
            acc = acc + jax.lax.dot_general(
                slab, weight, (((1,), (0,)), ((), ())), **_DOT)
            return (i + 1, T, sat, acc)

        init = (jnp.zeros((), jnp.int32),
                jnp.ones((1, PIXELS_PER_TILE), jnp.float32),
                jnp.zeros((1, PIXELS_PER_TILE), jnp.float32),
                jnp.zeros((8, PIXELS_PER_TILE), jnp.float32))
        i_final, T, _, acc = jax.lax.while_loop(cond, body, init)

        @pl.when((i_final < num_chunks) & (num_chunks > 0))
        def _():
            get_dma(i_final).wait()
        out_ref[0, :, :] = jnp.concatenate(
            [acc[0:3], 1.0 - T, acc[4:5],
             jnp.zeros((3, PIXELS_PER_TILE), jnp.float32)], axis=0)
    return kern


def run(mode, point_data, starts, ends, num_tiles, tiles_per_row):
    kernel = make_kernel(mode, tiles_per_row)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, PIXELS_PER_TILE),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_DATA_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    @jax.jit
    def f(pd, s, e):
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, PIXELS_PER_TILE),
                                           jnp.float32))(s, e, pd)
        # chain INSIDE the jit: one dispatch per rep (tunnel dispatch is
        # 10-20 ms, CLAUDE.md)
        return pd + out[0, 0, 0] * 0, out

    x, out = f(point_data, starts, ends)
    out.block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        x, out = f(x, starts, ends)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import bench
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, _project_and_bin)
    from taichi_3d_gaussian_splatting_tpu.ops.capacity import (
        auto_capacity_config)

    h, w = 544, 976
    intr = np.array([[581.7, 0, w / 2], [0, 581.7, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    pc, feats = bench.load_scene()
    n = pc.shape[0]
    invalid = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t_cam = jnp.zeros((1, 3))
    cfg0 = RasterizerConfig(near_plane=0.4, far_plane=1000.0,
                            max_tiles_per_point=32, rgb_only=True)
    cfg = auto_capacity_config(pc, feats, invalid, obj, [(q_cam, t_cam)],
                               cam, cfg0, headroom=1.1)
    _, _, _, binning = _project_and_bin(
        pc, feats, invalid, obj, q_cam, t_cam, cam, cfg, None)
    pd = jax.device_put(binning.point_data)
    starts = jax.device_put(binning.tile_starts)
    ends = jax.device_put(binning.tile_ends)
    num_tiles = cam.num_tiles
    tpr = cam.tiles_per_row
    for mode in ("full", "no_sat", "no_scan", "dma_only"):
        ms = run(mode, pd, starts, ends, num_tiles, tpr)
        print(f"{mode:>10}: {ms:.2f} ms/frame")


if __name__ == "__main__":
    main()
