"""A/B the blend-slab gather formulation (round-5, the megapoint bottleneck).

Round-4 trace: point_data = rows(16, N)[:, sorted_idx] costs 6.6 ns/index
(4.06 ms at 618k keys, ~43 ms extrapolated at 2.08M points). Hypothesis:
the column gather reads 16 STRIDED 4-byte words per index (16 HBM
transactions); a row-major (N, 16) table reads 64 contiguous bytes per
index. Variants measured with chained data-dependent calls (host timing
through the tunnel is meaningless otherwise, CLAUDE.md).

DCE WARNING (CLAUDE.md): every output is consumed into the chain carry.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

REPS = 30


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    carry = args[-1]
    for _ in range(REPS):
        out = fn_j(*args[:-1], carry)
        # fold a scalar of the output back into the index argument: a real
        # data dependency so the chain cannot overlap or DCE
        carry = carry + jnp.ravel(out)[0].astype(carry.dtype) * 0
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    return dt


def run_scale(n, mk, seed=0):
    rng = np.random.default_rng(seed)
    cols = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32))
    rows_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(cols).T))                      # (N, 16)
    idx = jnp.asarray(rng.integers(0, n, size=mk).astype(np.int32))
    print(f"--- N={n} MK={mk} ---", flush=True)

    def g_col(cols, idx):
        out = cols[:, idx]                        # (16, MK)
        return jnp.sum(out[:, ::4096])            # consume every row

    def g_row(rows_t, idx):
        out = rows_t[idx, :]                      # (MK, 16)
        return jnp.sum(out[::4096, :])

    def g_row_transpose(rows_t, idx):
        out = rows_t[idx, :].T                    # (16, MK) like today
        return jnp.sum(out[:, ::4096])

    def g_col_split4(cols, idx):
        s = jnp.float32(0)
        for i in range(4):
            s = s + jnp.sum(cols[4 * i:4 * i + 4, idx][:, ::4096])
        return s

    def g_row8(rows_t, idx):
        # gather only 8 of the 16 rows (is cost per index or per byte?)
        out = rows_t[idx, 0:8]
        return jnp.sum(out[::4096, :])

    def g_build_then_col(cols, idx):
        # include the (N,16) table build from the 16 columns, then row-gather
        t = cols.T
        out = t[idx, :]
        return jnp.sum(out[::4096, :])

    for name, fn, table in [
        ("col   (16,N)[:,idx]        ", g_col, cols),
        ("row   (N,16)[idx,:]        ", g_row, rows_t),
        ("row+T (N,16)[idx,:].T      ", g_row_transpose, rows_t),
        ("col4x (4,N)[:,idx] x4      ", g_col_split4, cols),
        ("row8  (N,16)[idx,:8]       ", g_row8, rows_t),
        ("build+row cols.T[idx,:]    ", g_build_then_col, cols),
    ]:
        dt = timed(name, fn, table, idx)
        print(f"{name} {dt:8.3f} ms  ({dt / mk * 1e6:6.2f} ns/idx)",
              flush=True)


if __name__ == "__main__":
    from taichi_3d_gaussian_splatting_tpu.utils import device_lock
    if not device_lock.acquire():
        raise SystemExit(f"chip busy: pid {device_lock.holder()}")
    try:
        print("backend:", jax.default_backend(), flush=True)
        run_scale(430_000, 618_496)
        run_scale(2_080_000, 6_600_704)
    finally:
        device_lock.release()
