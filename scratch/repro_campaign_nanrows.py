"""Dissect the real nonfinite grad rows from the round-4 campaign scene.

Loads /tmp/qb_full/logs/scene_30000.parquet (171k points, late training,
~170 nonfinite rows/iter observed) and runs one full-res VJP on CPU at a
real training pose, then prints the offending points' raw parameters and
projected attributes to locate the inf-jacobian source.
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("T3DGS_FORCE_CPU", "1")
import json
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianPointCloudScene, SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    RasterizerConfig, rasterize_with_vjp)
from taichi_3d_gaussian_splatting_tpu.ops.projection import compute_point_attributes

scene = GaussianPointCloudScene.from_parquet(
    "/tmp/qb_full/logs/scene_30000.parquet",
    SceneConfig(max_num_points_ratio=1.1))
n_valid = int((1 - np.asarray(scene.point_invalid_mask)).sum())
print("points:", scene.point_cloud.shape[0], "valid:", n_valid)

from taichi_3d_gaussian_splatting_tpu.data.dataset import _se3_to_qt

train = json.load(open("/tmp/qb_full/train.json"))
view = train[0]
intr = np.array(view["camera_intrinsics"], np.float32)
H, W = view["camera_height"], view["camera_width"]
# crop to tile multiple of 16 like the dataset does
H16, W16 = (H // 16) * 16, (W // 16) * 16
cam = CameraInfo(camera_intrinsics=intr, camera_height=H16, camera_width=W16)

CFG = RasterizerConfig(near_plane=0.4, far_plane=2000.0,
                       max_tiles_per_point=16)

for vi in range(3):
    view = train[vi]
    qn, tn = _se3_to_qt(np.array(view["T_pointcloud_camera"], np.float32))
    q = jnp.asarray(qn).reshape(1, 4)
    t = jnp.asarray(tn).reshape(1, 3)
    args = (scene.point_cloud, scene.point_cloud_features,
            scene.point_invalid_mask, scene.point_object_id, q, t)
    result, vjp_fn = rasterize_with_vjp(*args, cam, CFG)
    grad_pc, grad_feats, _ = vjp_fn(jnp.ones_like(result.image) * 1e-3)
    gf = np.asarray(grad_feats)
    gp = np.asarray(grad_pc)
    bad = ~(np.all(np.isfinite(gf), axis=1) & np.all(np.isfinite(gp), axis=1))
    rows = np.where(bad)[0]
    print(f"view {vi}: nonfinite rows = {len(rows)}, "
          f"nonfinite_points(fwd) = {int(result.aux.nonfinite_points)}")
    if len(rows) == 0:
        continue
    # which feature columns are bad?
    colbad = (~np.isfinite(gf[rows])).sum(0)
    print("  bad col histogram (feat):", {i: int(c) for i, c in enumerate(colbad) if c})
    print("  bad pc cols:", (~np.isfinite(gp[rows])).sum(0))
    # dump raw params of the first few bad rows
    feats = np.asarray(scene.point_cloud_features)
    pc = np.asarray(scene.point_cloud)
    inval = np.asarray(scene.point_invalid_mask)
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import quaternion_normalize
    # recompute attributes to see where these rows sit
    attrs = compute_point_attributes(
        scene.point_cloud, scene.point_cloud_features,
        scene.point_invalid_mask, scene.point_object_id,
        q, t, t, cam, 0.4, 2000.0)
    for r in rows[:8]:
        print(f"  row {r}: invalid={inval[r]} pc={pc[r]} "
              f"q={feats[r,0:4]} logs={feats[r,4:7]} alpha={feats[r,7]:.3f}")
        print(f"    u={float(attrs.u[r]):.2f} v={float(attrs.v[r]):.2f} "
              f"depth={float(attrs.depth[r]):.4f} "
              f"in_frustum={bool(attrs.in_frustum[r])} "
              f"conic=({float(attrs.conic_a[r]):.3e},{float(attrs.conic_b[r]):.3e},{float(attrs.conic_c[r]):.3e}) "
              f"rescale={float(attrs.rescale[r]):.3e} "
              f"rx={float(attrs.radius_x[r]):.3e} ry={float(attrs.radius_y[r]):.3e}")
        print(f"    grad_feats bad cols: {np.where(~np.isfinite(gf[r]))[0].tolist()}"
              f" grad_pc: {gp[r]}")
    break
