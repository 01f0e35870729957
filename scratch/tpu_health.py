"""Tiny TPU health check: one small compile + execute, bounded."""
import sys, time
sys.path.insert(0, "/root/repo")
from taichi_3d_gaussian_splatting_tpu.utils import device_lock
import jax, jax.numpy as jnp

if not device_lock.acquire():
    raise SystemExit(f"busy: {device_lock.holder()}")
try:
    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    y = jax.jit(lambda a: (a @ a).sum())(x)
    print("backend:", jax.default_backend(), "result:", float(y),
          f"({time.perf_counter() - t0:.1f}s)")
finally:
    device_lock.release()
