"""Prototype: rgb blend kernel with keys on SUBLANES, pixels on LANES.
- exponent via MXU: E(chunk,256) = coef_rows(8,chunk)^T-contracted mono(256,8)
- transmittance cumprod over sublanes
Measures against the same synthetic workload as perf_kernel_ablate.
"""
import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys; sys.path.insert(0, "/root/repo")

NUM_TILES = 2074
TPR = 61
MK = 786432
CHUNK = 128
PIX = 256
TILE_W = 16

ALPHA_SKIP = 1.0 / 255.0
ALPHA_CLAMP = 0.99
SAT = 1e-4

# slab rows: 0..5 quadratic coefs (c_xx, c_xy, c_yy, c_x, c_y, c_1),
# 8..12: r, g, b, depth, one
C_XX, C_XY, C_YY, C_X, C_Y, C_1 = range(6)


def _sub_cumprod_exclusive(x):
    """Exclusive prefix product along axis 0 (sublanes)."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    acc = jnp.where(row < 1, jnp.ones_like(x), pltpu.roll(x, 1, 0))
    k = 1
    while k < n:
        rolled = pltpu.roll(acc, k, 0)
        acc = acc * jnp.where(row < k, jnp.ones_like(acc), rolled)
        k *= 2
    return acc


def make_kern(mode):
  def kern(starts_ref, ends_ref, data_hbm, out_ref, chunk_buf, dma_sem):
      t = pl.program_id(0)
      start = starts_ref[t]
      end = ends_ref[t]
      aligned_start = (start // CHUNK) * CHUNK
      num_chunks = jnp.where(end > start, pl.cdiv(end - aligned_start, CHUNK), 0)

      # mono(256, 8): [px^2, px*py, py^2, px, py, 1, 0, 0] per pixel
      tile_u = t % TPR
      tile_v = t // TPR
      idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
      px = (tile_u * TILE_W + idx % TILE_W).astype(jnp.float32) + 0.5
      py = (tile_v * TILE_W + idx // TILE_W).astype(jnp.float32) + 0.5
      mono = jnp.concatenate(
          [px * px, px * py, py * py, px, py, jnp.ones_like(px),
           jnp.zeros_like(px), jnp.zeros_like(px)], axis=1)      # (256, 8)

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
          data = chunk_buf[jax.lax.rem(i, 2)]       # (16, CHUNK)

          # E[k, p] = sum_j coef[j, k] * mono[p, j]  -> (CHUNK, 256)
          E = jax.lax.dot_general(
              data[0:8, :], mono, (((0,), (1,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
          a_exp = jnp.exp(E)
          row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
          gidx = col0 + row
          in_segment = (gidx >= start) & (gidx < end)
          a_v = jnp.where(in_segment & (a_exp >= ALPHA_SKIP),
                          jnp.minimum(a_exp, ALPHA_CLAMP), 0.0)
          one_minus = 1.0 - a_v
          if mode == "no_scan":
              T_i = T * one_minus
          else:
              T_i = T * _sub_cumprod_exclusive(one_minus)      # (CHUNK, 256)

          tnext = T_i * one_minus
          positive = (a_v > 0.0).astype(jnp.float32)
          hit = positive * (tnext < SAT).astype(jnp.float32)
          contribute = positive * (tnext >= SAT).astype(jnp.float32) * (1.0 - sat)
          col_hit = jnp.max(hit, axis=0, keepdims=True)      # (1, 256)
          T_at_hit = jnp.max(T_i * hit, axis=0, keepdims=True)
          T_new = jnp.where(col_hit > 0.5, T_at_hit, tnext[-1:, :])
          T_new = jnp.where(sat > 0.5, T, T_new)
          sat = jnp.maximum(sat, col_hit)

          weight = contribute * a_v * T_i                    # (CHUNK, 256)
          acc = acc + jax.lax.dot_general(
              data[8:16, :], weight, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)           # (8, 256)
          return (i + 1, T_new, sat, acc)

      init = (jnp.zeros((), jnp.int32),
              jnp.ones((1, PIX), jnp.float32),
              jnp.zeros((1, PIX), jnp.float32),
              jnp.zeros((8, PIX), jnp.float32))
      i_final, T, _, acc = jax.lax.while_loop(cond, body, init)

      @pl.when((i_final < num_chunks) & (num_chunks > 0))
      def _():
          get_dma(i_final).wait()

      out = jnp.concatenate([acc[0:4], 1.0 - T, acc[5:8]], axis=0)
      out_ref[0, :, :] = out


  return kern

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(NUM_TILES,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((1, 8, PIX), lambda t, s, e: (t, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((2, 16, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))])
def build(mode):
  return pl.pallas_call(
    make_kern(mode), grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((NUM_TILES, 8, PIX), jnp.float32))

rng = np.random.default_rng(0)
u = rng.uniform(0, 976, MK).astype(np.float32)
v = rng.uniform(0, 544, MK).astype(np.float32)
ca = np.full(MK, 0.1, np.float32)   # conic a
cb = np.zeros(MK, np.float32)
cc = np.full(MK, 0.1, np.float32)
logw = np.full(MK, -1.0, np.float32)
data = np.zeros((16, MK), np.float32)
data[C_XX] = -0.5 * ca
data[C_XY] = -cb
data[C_YY] = -0.5 * cc
data[C_X] = ca * u + cb * v
data[C_Y] = cc * v + cb * u
data[C_1] = logw - 0.5 * (ca * u * u + 2 * cb * u * v + cc * v * v)
data[8:11] = 0.5
data[11] = 10.0
data[12] = 1.0
data_j = jnp.array(data)

KEYS = 646871
edges = np.linspace(0, KEYS, NUM_TILES + 1).astype(np.int32)
starts = jnp.array(edges[:-1]); ends = jnp.array(edges[1:])


def timeit(name, pcall, iters=30):
    x0 = jnp.zeros((8,), jnp.float32)
    @jax.jit
    def wrapped(x):
        d = data_j.at[0, 0].add(x[0] * 1e-20)
        out = pcall(starts, ends, d)
        return x + out[0, 0, 0] * 0
    out = wrapped(x0); jax.block_until_ready(out)
    for _ in range(2):
        t0 = time.perf_counter(); x = x0
        for _ in range(iters):
            x = wrapped(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:36s}: {dt:7.2f} ms", flush=True)


timeit("flipped full", build("full"))
timeit("flipped no_scan", build("no_scan"))
