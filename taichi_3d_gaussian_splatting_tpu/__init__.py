"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of
wanmeihuali/taichi_3d_gaussian_splatting for TPU hardware:

- The Taichi CUDA kernel pipeline (frustum filter, EWA projection, tile
  binning, radix sort, tile-parallel alpha blending with hand-written
  gradients) becomes a fully static-shape JAX program: batched jnp math for
  the point-parallel stages, ``jax.lax.sort`` for the key sort, and Pallas
  TPU kernels (MXU matmul formulation of the blending scan) for the per-tile
  forward/backward blend.
- The model is a pytree of fixed-capacity arrays with an invalid mask, which
  mirrors the reference's fixed-pool densification design
  (reference: GaussianPointAdaptiveController.py:47-52) and is exactly the
  static-shape discipline XLA requires.
- Scene artifacts stay interchange-compatible: the 59-column parquet schema
  and the official-implementation PLY layout
  (reference: GaussianPointCloudScene.py:132-210).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: full-resolution pipelines take minutes to
# compile; the cache makes every later process start instant. Opt out with
# T3DGS_NO_COMPILE_CACHE=1.
import os as _os

# T3DGS_FORCE_CPU=1 pins the CPU backend (the axon TPU plugin overrides a
# bare JAX_PLATFORMS env var, so scripts need this config-level escape
# hatch; tests/conftest.py does the same thing directly)
if _os.environ.get("T3DGS_FORCE_CPU"):
    import jax as _jax_cpu

    _jax_cpu.config.update("jax_platforms", "cpu")

if not _os.environ.get("T3DGS_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "T3DGS_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "t3dgs_jax"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .camera import CameraInfo

__all__ = ["CameraInfo", "__version__"]
