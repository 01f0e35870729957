"""Size the per-cell ellipse/tile-row interval culling prize (CPU).

For each bench scene, compares bbox-cell emission (today) against the
convex row-interval count: keys whose tile rect lies wholly outside the
{q <= tau} ellipse (tau = r_eff^2, the blend's 1/255 skip gate radius)
can be dropped bit-exactly.
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ["T3DGS_FORCE_CPU"] = "1"
import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT
from taichi_3d_gaussian_splatting_tpu.ops.projection import compute_point_attributes
from taichi_3d_gaussian_splatting_tpu.ops.tiling import tile_bbox


def analyze(pc, feats, name, h=544, w=976):
    n = pc.shape[0]
    intr = np.array([[581.7, 0, w / 2], [0, 581.7, h / 2], [0, 0, 1]],
                    np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=h, camera_width=w)
    a = compute_point_attributes(
        jnp.asarray(pc), jnp.asarray(feats), jnp.zeros((n,), jnp.int8),
        jnp.zeros((n,), jnp.int32), jnp.array([[0.0, 0.0, 0.0, 1.0]]),
        jnp.zeros((1, 3)), jnp.zeros((1, 3)), cam, 0.4, 1000.0)
    min_u, max_u, min_v, max_v = tile_bbox(a.u, a.v, a.radius_x, a.radius_y,
                                           cam)
    emit = np.asarray(a.emit)
    min_u = np.asarray(min_u)[emit]; max_u = np.asarray(max_u)[emit]
    min_v = np.asarray(min_v)[emit]; max_v = np.asarray(max_v)[emit]
    u = np.asarray(a.u)[emit]; v = np.asarray(a.v)[emit]
    ca = np.asarray(a.conic_a)[emit].astype(np.float64)
    cb = np.asarray(a.conic_b)[emit].astype(np.float64)
    cc = np.asarray(a.conic_c)[emit].astype(np.float64)
    rescale = np.asarray(a.rescale)[emit]
    alpha = np.asarray(a.alpha_after_activation)[emit]
    peak = np.maximum(rescale * alpha, 1e-30)
    tau = np.maximum(2.0 * np.log(255.0 * peak), 0.0)
    bbox_keys = int(np.sum((max_u - min_u) * (max_v - min_v)))

    det = ca * cc - cb * cb
    # per-row interval count, vectorized over rows
    total = 0
    R = int(np.max(max_v - min_v))
    for r in range(R):
        row = min_v + r
        live = row < max_v
        y0 = row * TILE_HEIGHT + 0.5 - v
        y1 = row * TILE_HEIGHT + TILE_HEIGHT - 0.5 - v
        # x extent of ellipse {q<=tau} within band [y0, y1]
        x_g = np.sqrt(np.maximum(tau * cc / det, 0.0))
        dy_hi = np.clip(-(cb / cc) * x_g, y0, y1)    # argmax of x_hi
        dy_lo = np.clip((cb / cc) * x_g, y0, y1)     # argmin of x_lo
        disc_hi = np.maximum(ca * tau - det * dy_hi * dy_hi, 0.0)
        disc_lo = np.maximum(ca * tau - det * dy_lo * dy_lo, 0.0)
        x_hi = (-cb * dy_hi + np.sqrt(disc_hi)) / ca
        x_lo = (-cb * dy_lo - np.sqrt(disc_lo)) / ca
        dy_n = np.clip(0.0, y0, y1)
        nonempty = (ca * tau - det * dy_n * dy_n) >= 0.0
        col_lo = np.ceil((u + x_lo - (TILE_WIDTH - 0.5)) / TILE_WIDTH)
        col_hi = np.floor((u + x_hi - 0.5) / TILE_WIDTH)
        col_lo = np.maximum(col_lo, min_u)
        col_hi = np.minimum(col_hi, max_u - 1)
        cnt = np.where(live & nonempty,
                       np.maximum(col_hi - col_lo + 1, 0), 0)
        total += int(cnt.sum())
    print(f"{name}: visible={emit.sum()} bbox_keys={bbox_keys} "
          f"culled_keys={total} keep={total / bbox_keys:.3f}")


import bench  # noqa: E402

os.environ.pop("BENCH_SCENE_KIND", None)
pc, feats = bench.load_scene()
analyze(np.asarray(pc), np.asarray(feats), "uniform-430k")

os.environ["BENCH_SCENE_KIND"] = "heavy"
os.environ["BENCH_POINTS"] = "1030000"
pc, feats = bench.load_scene()
analyze(np.asarray(pc), np.asarray(feats), "heavy-1.03M")

os.environ["BENCH_POINTS"] = "2080000"
pc, feats = bench.load_scene()
analyze(np.asarray(pc), np.asarray(feats), "heavy-2.08M")
