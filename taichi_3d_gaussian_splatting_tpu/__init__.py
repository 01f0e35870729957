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

from .camera import CameraInfo

__all__ = ["CameraInfo", "__version__"]
