"""Find the VJP NaN source for collapsed-scale splats (round-5 root fix).

Round-4 campaigns zeroed ~170 nonfinite grad rows/iter in late training;
containment absorbs it but those points stop learning. Plant splats with
progressively collapsed log-scales and report which gradient rows go
non-finite and at what collapse level.
"""
import os
import sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("T3DGS_FORCE_CPU", "1")
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize_with_vjp)

H = W = 32


def _cam():
    intr = np.array([[24.0, 0, W / 2], [0, 24.0, H / 2], [0, 0, 1]],
                    np.float32)
    return CameraInfo(camera_intrinsics=intr, camera_height=H,
                      camera_width=W)


CFG = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                       max_tiles_per_point=16, mid_point_divisor=1,
                       big_point_divisor=2)


def run(scale_log, aniso=False, alpha=2.0):
    n = 8
    rng = np.random.default_rng(0)
    pc = np.concatenate([
        rng.uniform(-0.5, 0.5, (n, 2)),
        rng.uniform(1.5, 2.5, (n, 1))], axis=1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.5, (n, 3))
    feats[:, 7] = alpha
    feats[:, 8] = 1.0
    # plant: point 3 collapsed
    if aniso:
        feats[3, 4] = scale_log      # one axis collapsed only
    else:
        feats[3, 4:7] = scale_log
    args = (jnp.array(pc), jnp.array(feats), jnp.zeros((n,), jnp.int8),
            jnp.zeros((n,), jnp.int32), jnp.array([[0.0, 0.0, 0.0, 1.0]]),
            jnp.zeros((1, 3)))
    result, vjp_fn = rasterize_with_vjp(*args, _cam(), CFG)
    grad_pc, grad_feats, _ = vjp_fn(jnp.ones_like(result.image))
    gf = np.asarray(grad_feats)
    gp = np.asarray(grad_pc)
    bad_f = ~np.isfinite(gf)
    bad_p = ~np.isfinite(gp)
    rows = sorted(set(np.where(bad_f.any(1))[0]) | set(np.where(bad_p.any(1))[0]))
    cols = np.where(bad_f.any(0))[0]
    nfp = int(result.aux.nonfinite_points)
    print(f"scale_log={scale_log:7.1f} aniso={aniso} alpha={alpha}: "
          f"nonfinite rows={rows} cols={cols.tolist()} "
          f"nonfinite_points={nfp} "
          f"g3_feats={gf[3, [4,5,6,7]]} g3_pc={gp[3]}")


for s in [-5.0, -10.0, -15.0, -20.0, -30.0, -45.0, -60.0, -90.0]:
    run(s)
print()
for s in [-10.0, -20.0, -45.0, -90.0]:
    run(s, aniso=True)
print()
# invisible splat (peak < 1/255): culled by the visibility gate
run(-2.0, alpha=-8.0)
run(-20.0, alpha=-8.0)
