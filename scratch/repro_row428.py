"""Bisect the inf-jacobian op for campaign row 428 (behind-camera splat,
collapsed scales): jacobian of each differentiable blend input column wrt
(pc, feats[0:8])."""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("T3DGS_FORCE_CPU", "1")
import json
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
from taichi_3d_gaussian_splatting_tpu.data.dataset import _se3_to_qt
from taichi_3d_gaussian_splatting_tpu.ops.projection import compute_point_attributes
from taichi_3d_gaussian_splatting_tpu.ops.transforms import inverse_SE3_qt

pc0 = np.array([[7.1163487, 0.7742957, -2.0796092]], np.float32)
f0 = np.zeros((1, 56), np.float32)
f0[0, 0:4] = [0.1136686, -0.00534092, 0.9679631, -0.22600923]
f0[0, 4:7] = [-7.8199954, -8.162953, -1.941794]
f0[0, 7] = 0.594
f0[0, 8] = 1.0

view = json.load(open("/tmp/qb_full/train.json"))[0]
intr = np.array(view["camera_intrinsics"], np.float32)
cam = CameraInfo(camera_intrinsics=intr, camera_height=544, camera_width=976)
qn, tn = _se3_to_qt(np.array(view["T_pointcloud_camera"], np.float32))
q_cam, t_cam = inverse_SE3_qt(jnp.asarray(qn), jnp.asarray(tn))

NAMES = ["u", "v", "conic_a", "conic_b", "conic_c", "logw",
         "color_r", "color_g", "color_b", "radius_x", "radius_y", "radii",
         "alpha", "rescale", "depth"]


def outputs(pc, feats):
    a = compute_point_attributes(
        pc, feats, jnp.zeros((1,), jnp.int8), jnp.zeros((1,), jnp.int32),
        q_cam, t_cam, jnp.asarray(tn), cam, 0.4, 2000.0)
    logw = jnp.log(jnp.maximum(a.alpha_after_activation, 1e-30))
    return jnp.stack([a.u[0], a.v[0], a.conic_a[0], a.conic_b[0],
                      a.conic_c[0], logw[0], a.color_r[0], a.color_g[0],
                      a.color_b[0], a.radius_x[0], a.radius_y[0], a.radii[0],
                      a.alpha_after_activation[0], a.rescale[0], a.depth[0]])


J_pc, J_f = jax.jacrev(outputs, argnums=(0, 1))(jnp.asarray(pc0),
                                                jnp.asarray(f0))
J_pc = np.asarray(J_pc)[:, 0, :]          # (out, 3)
J_f = np.asarray(J_f)[:, 0, :8]           # (out, 8)
vals = np.asarray(outputs(jnp.asarray(pc0), jnp.asarray(f0)))
for i, nm in enumerate(NAMES):
    bad_pc = np.where(~np.isfinite(J_pc[i]))[0]
    bad_f = np.where(~np.isfinite(J_f[i]))[0]
    flag = " <-- NONFINITE" if (len(bad_pc) or len(bad_f)) else ""
    print(f"{nm:10s} val={vals[i]: .4e} badJ_pc={bad_pc.tolist()} "
          f"badJ_feat={bad_f.tolist()}{flag}")
    if flag:
        print("   J_pc:", J_pc[i], "\n   J_f[:8]:", J_f[i])
