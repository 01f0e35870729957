"""DCE-safe sort variant probe at inference emission shapes.

Variants:
  A: current 2-operand int32 sort (key, id)
  B: single-operand int64 packed (key << 20 | id)
  C: 2-operand at 75% rows (what a 3-tier emission would give)
  D: 2-operand at 67% rows

Every output is consumed (summed into the chain) so XLA cannot DCE operands.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

EM_CAP = 2_580_480
REPS = 30


def chain_time(fn, x):
    x = jnp.asarray(x)
    f = jax.jit(fn)
    y = f(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = f(y)
    y.block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    # realistic key distribution: ~25% valid rows, rest INT32_MAX padding
    valid_frac = 0.25
    nvalid = int(EM_CAP * valid_frac)
    keys = np.full(EM_CAP, np.iinfo(np.int32).max, np.int32)
    keys[:nvalid] = rng.integers(0, 2**30, nvalid, dtype=np.int32)
    rng.shuffle(keys)
    ids = rng.integers(0, 430_000, EM_CAP, dtype=np.int32)

    ids_j = jnp.asarray(ids)

    def variant_a(seed):
        k = jnp.asarray(keys) ^ (seed & 1)
        sk, si = jax.lax.sort((k, ids_j), num_keys=1, is_stable=False)
        return seed + sk[::1024].sum() + si[::1024].sum()

    def variant_b(seed):
        k = (jnp.asarray(keys) ^ (seed & 1)).astype(jnp.int64)
        packed = (k << 20) | ids_j.astype(jnp.int64)
        sp = jax.lax.sort((packed,), num_keys=1, is_stable=False)[0]
        sk = (sp >> 20).astype(jnp.int32)
        si = (sp & ((1 << 20) - 1)).astype(jnp.int32)
        return seed + sk[::1024].sum() + si[::1024].sum()

    def make_frac(frac):
        cap = int(EM_CAP * frac) // 1024 * 1024
        kf = jnp.asarray(keys[:cap])
        idf = ids_j[:cap]

        def v(seed):
            k = kf ^ (seed & 1)
            sk, si = jax.lax.sort((k, idf), num_keys=1, is_stable=False)
            return seed + sk[::1024].sum() + si[::1024].sum()
        return v

    for name, fn in [("A 2op int32 100%", variant_a),
                     ("B 1op int64 100%", variant_b),
                     ("C 2op int32  75%", make_frac(0.75)),
                     ("D 2op int32  67%", make_frac(0.67)),
                     ("E 2op int32  56%", make_frac(0.56))]:
        ms = chain_time(fn, jnp.int32(0))
        print(f"{name}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
