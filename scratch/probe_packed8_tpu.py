"""Tiny on-chip probe: does the packed8 slab (int32 bitcast rows + bf16
unpack inside the Pallas kernel) lower through Mosaic and match wide16?

Run BEFORE any large packed8 compile: a lowering failure here costs
seconds; at 2.08M it would cost a wedge-risk compile. Prints PASS/FAIL.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, rasterize)
    import dataclasses

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    n = 4000
    pc = np.concatenate([
        rng.uniform(-0.8, 0.8, (n, 2)),
        rng.uniform(1.0, 4.0, (n, 1)),
    ], axis=1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.5, -1.0, (n, 3))
    feats[:, 7] = 2.0 + rng.normal(size=n)
    feats[:, 8] = 1.0
    feats[:, 24] = 0.5

    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=K, camera_height=64, camera_width=64)
    inv = jnp.zeros((n,), jnp.int8)
    obj = jnp.zeros((n,), jnp.int32)
    q_cam = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    t_cam = jnp.zeros((1, 3))
    base = RasterizerConfig(near_plane=0.1, far_plane=100.0,
                            max_tiles_per_point=32, rgb_only=True)
    img = {}
    for fmt in ("wide16", "packed8"):
        cfg = dataclasses.replace(base, slab_format=fmt)
        img[fmt] = np.asarray(rasterize(
            jnp.array(pc), jnp.array(feats), inv, obj, q_cam, t_cam,
            cam, cfg).image)
        print(f"{fmt}: rendered, mean={img[fmt].mean():.6f}", flush=True)
    d = np.abs(img["packed8"] - img["wide16"])
    print(f"max|diff|={d.max():.2e} mean|diff|={d.mean():.2e}", flush=True)
    ok = np.isfinite(img["packed8"]).all() and d.max() < 3e-3
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    from taichi_3d_gaussian_splatting_tpu.utils import device_lock
    if not device_lock.acquire():
        raise SystemExit(f"chip busy: pid {device_lock.holder()}")
    try:
        raise SystemExit(main())
    finally:
        device_lock.release()
