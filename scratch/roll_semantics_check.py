"""Does pltpu.roll on REAL hardware match jnp.roll in interpret mode?

The sublane prefix scans in blend_pallas assume roll(x, k, axis=0) moves
row i to row i+k (wrap), i.e. jnp.roll semantics. If Mosaic's roll went the
other way, compiled kernels would compute a (consistent) but different
transmittance than the interpret-mode reference - the exact signature of
the A/B divergence. Run on the TPU; PASS = identical.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_3d_gaussian_splatting_tpu.ops.blend_pallas import (
    _sub_cumprod_exclusive, _sub_cumsum_exclusive)


def kernel(x_ref, o_ref, *, interpret):
    x = x_ref[...]
    roll1 = (jnp.roll(x, 1, 0) if interpret else pltpu.roll(x, 1, 0))
    cp = _sub_cumprod_exclusive(x, interpret)
    cs = _sub_cumsum_exclusive(x, interpret)
    o_ref[0] = roll1
    o_ref[1] = cp
    o_ref[2] = cs


def run(interpret):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 1.0, (8, 128)).astype(np.float32))
    out = pl.pallas_call(
        lambda x_ref, o_ref: kernel(x_ref, o_ref, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((3, 8, 128), jnp.float32),
        interpret=interpret,
    )(x)
    return np.asarray(out), np.asarray(x)


compiled, x = run(interpret=False)
interp, _ = run(interpret=True)
names = ["roll+1", "cumprod_excl", "cumsum_excl"]
ok = True
for i, nm in enumerate(names):
    d = np.abs(compiled[i] - interp[i]).max()
    print(f"{nm}: max_abs_diff={d:.3e}")
    ok &= d < 1e-6
# also check against pure numpy expectations
np_roll = np.roll(x, 1, 0)
print("compiled roll vs numpy:", np.abs(compiled[0] - np_roll).max())
np_cp = np.ones_like(x)
np_cp[1:] = np.cumprod(x, axis=0)[:-1]
print("compiled cumprod vs numpy:", np.abs(compiled[1] - np_cp).max())
print("PASS" if ok else "FAIL")
