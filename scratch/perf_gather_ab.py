"""A/B the blend-slab gather formulation (round-5, the megapoint bottleneck).

Round-4 trace: point_data = rows(16, N)[:, sorted_idx] costs 6.6 ns/index
(4.06 ms at 618k keys; the 2.08M bench spends most of its 77.5 ms here).
Hypothesis: the column gather reads 16 STRIDED 4-byte words per index
(16 HBM transactions); a row-major (N, 16) table reads 64 contiguous bytes
per index.

Methodology (learned the hard way): the gather output is pushed through an
optimization_barrier so XLA materializes the FULL gather (fusing a strided
consumer INTO the gather changes what is measured - the first version of
this probe reported 144 ns/idx for the production formulation and faulted
the device on a gather-of-strided-slice fusion). Consumption after the
barrier is a tiny slice. Chained data-dependent calls (CLAUDE.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

REPS = 20


def timed(fn, *args):
    fn_j = jax.jit(fn)
    carry = args[-1]
    out = fn_j(*args[:-1], carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn_j(*args[:-1], carry)
        carry = carry + jnp.ravel(out)[0].astype(carry.dtype) * 0
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / REPS * 1e3


def consume(out):
    out = jax.lax.optimization_barrier(out)
    return jnp.sum(out[:, :8])


def run_scale(n, mk, seed=0):
    rng = np.random.default_rng(seed)
    cols = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32))
    rows_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(cols).T))                      # (N, 16)
    idx = jnp.asarray(rng.integers(0, n, size=mk).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
    print(f"--- N={n} MK={mk} ---", flush=True)

    def g_col(cols, idx):
        return consume(cols[:, idx])              # (16, MK) - production

    def g_row(rows_t, idx):
        return consume(rows_t[idx, :])            # (MK, 16)

    def g_row_transpose(rows_t, idx):
        return consume(rows_t[idx, :].T)          # (16, MK) like today

    def g_build_row_t(cols, idx):
        # include the per-frame (N,16) table build from the 16 columns
        return consume(cols.T[idx, :].T)

    def g_prod(cols, idx):
        # EXACT production formulation (ops/tiling.py slab_gather="row"):
        # barrier'd (16,N) columns -> .T -> fused-transpose lax.gather
        rows = jax.lax.optimization_barrier(cols)
        rows_t = rows.T
        out = jax.lax.gather(
            rows_t, idx[None, :, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 16),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(16, -1)
        return consume(out)

    def g_row_fused(rows_t, idx):
        # transpose fused INTO the gather: out[j, b] = table[idx[b], j]
        out = jax.lax.gather(
            rows_t, idx[None, :, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(0,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 16),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )                                         # (16, MK)? check shape
        return consume(out.reshape(16, -1))

    for name, fn, table, ix in [
        ("col    (16,N)[:,idx]       ", g_col, cols, idx),
        ("row    (N,16)[idx,:]       ", g_row, rows_t, idx),
        ("row+T  (N,16)[idx,:].T     ", g_row_transpose, rows_t, idx),
        ("buildT cols.T[idx,:].T     ", g_build_row_t, cols, idx),
        ("fused  lax.gather (16,MK)  ", g_row_fused, rows_t, idx),
        ("PROD   barrier+T+fused     ", g_prod, cols, idx),
        ("row-sortedidx              ", g_row, rows_t, idx_sorted),
    ]:
        dt = timed(fn, table, ix)
        print(f"{name} {dt:8.3f} ms  ({dt / mk * 1e6:6.2f} ns/idx)",
              flush=True)


if __name__ == "__main__":
    from taichi_3d_gaussian_splatting_tpu.utils import device_lock
    if not device_lock.acquire():
        raise SystemExit(f"chip busy: pid {device_lock.holder()}")
    try:
        print("backend:", jax.default_backend(), flush=True)
        run_scale(430_000, 618_496)
        run_scale(1_030_000, 3_300_352)
        run_scale(2_080_000, 6_600_704)
    finally:
        device_lock.release()
