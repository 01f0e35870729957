"""Procedural OUT-OF-MODEL ground truth for the full-scale quality campaign.

The toy quality benchmark renders its ground truth from gaussians - an
in-model recovery problem. Real photos are out-of-model: no finite gaussian
mixture reproduces them exactly, and densification has to work for the fit
to be good. This module is an honest stand-in that ships with the repo: a
tiny numpy ray tracer over textured analytic surfaces (checkerboard ground,
procedurally textured spheres, gradient sky), Lambertian-shaded with a fixed
light so the radiance is view-consistent - exactly the regime 3DGS assumes.

Everything is vectorized numpy; a 976x544 view renders in well under a
second on the host.
"""

from __future__ import annotations

import numpy as np

# scene layout (world units; y is DOWN in camera convention, so the ground
# plane sits at positive y and "up" is -y)
GROUND_Y = 0.8
GROUND_RADIUS = 8.0
SPHERES = [
    # (center, radius, texture id)
    (np.array([0.0, 0.30, 0.0]), 0.5, 0),
    (np.array([0.9, 0.50, 0.4]), 0.3, 1),
    (np.array([-0.85, 0.45, -0.45]), 0.35, 2),
    (np.array([0.25, 0.62, -0.85]), 0.18, 3),
]
LIGHT_DIR = np.array([0.45, -0.8, 0.35])
LIGHT_DIR = LIGHT_DIR / np.linalg.norm(LIGHT_DIR)
AMBIENT = 0.35
DIFFUSE = 0.65


def _vnoise(x, z, seed=0.0):
    """Deterministic bilinear value noise on the (x, z) lattice (classic
    sin-hash; no state, reproducible across runs/processes)."""
    ix, iz = np.floor(x), np.floor(z)
    fx, fz = x - ix, z - iz
    fx = fx * fx * (3.0 - 2.0 * fx)
    fz = fz * fz * (3.0 - 2.0 * fz)

    def h(a, b):
        s = np.sin(a * 12.9898 + b * 78.233 + seed * 37.719) * 43758.5453
        return s - np.floor(s)

    v00, v10 = h(ix, iz), h(ix + 1.0, iz)
    v01, v11 = h(ix, iz + 1.0), h(ix + 1.0, iz + 1.0)
    return ((v00 * (1.0 - fx) + v10 * fx) * (1.0 - fz)
            + (v01 * (1.0 - fx) + v11 * fx) * fz)


def _detail_field(x, z, octaves, base_freq=2.0, seed=0.0):
    """Multi-octave value noise in [0, 1]; octaves=0 -> constant 0.5 (the
    detail-free scene, bit-compatible with pre-knob GT renders)."""
    if octaves <= 0:
        return 0.5
    acc = 0.0
    amp = 0.0
    for o in range(octaves):
        f = base_freq * (2.0 ** o)
        acc = acc + 0.5 ** o * _vnoise(x * f, z * f, seed + o)
        amp += 0.5 ** o
    return acc / amp


def _checker(x, z, detail=0):
    """Ground texture: 2-tone checker with a soft radial falloff; `detail`
    octaves of value noise modulate luminance (high-frequency out-of-model
    content that forces densification into the reference's 400k+ regime)."""
    c = ((np.floor(x * 1.25) + np.floor(z * 1.25)) % 2.0)
    base = np.where(c > 0.5, 0.82, 0.28)
    tint = 0.5 + 0.5 * np.cos(0.7 * x) * np.sin(0.9 * z)
    r = base * (0.8 + 0.2 * tint)
    g = base * (0.75 + 0.1 * tint)
    b = base * 0.7
    tex = np.stack([r, g, b], axis=-1)
    if detail:
        m = _detail_field(x, z, detail)
        tex = tex * (0.55 + 0.9 * m)[..., None]
    return tex


def _sphere_texture(tex_id, n, detail=0):
    """Per-texture procedural color from the surface normal (n = unit);
    `detail` octaves of value noise over two normal charts add
    high-frequency out-of-model content (see _checker)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    if detail:
        m = 0.5 * (_detail_field(3.0 * x, 3.0 * y + 11.0 * tex_id, detail)
                   + _detail_field(3.0 * y + 7.0, 3.0 * z + 13.0, detail))
        mod = (0.6 + 0.8 * m)[..., None]
    else:
        mod = 1.0
    tex = _sphere_texture_base(tex_id, x, y, z)
    return tex * mod


def _sphere_texture_base(tex_id, x, y, z):
    if tex_id == 0:       # marble-ish bands
        t = 0.5 + 0.5 * np.sin(8.0 * x + 4.0 * np.sin(5.0 * y))
        return np.stack([0.85 * t + 0.1, 0.25 + 0.45 * t, 0.3 - 0.15 * t],
                        axis=-1)
    if tex_id == 1:       # latitude stripes
        t = 0.5 + 0.5 * np.sin(14.0 * y)
        return np.stack([0.2 + 0.25 * t, 0.45 + 0.4 * t, 0.9 - 0.5 * t],
                        axis=-1)
    if tex_id == 2:       # dots
        t = (np.sin(9.0 * x) * np.sin(9.0 * y) * np.sin(9.0 * z)) > 0.15
        return np.where(t[..., None],
                        np.array([0.95, 0.85, 0.2]),
                        np.array([0.35, 0.6, 0.25]))
    t = 0.5 + 0.5 * np.sin(20.0 * (x + z))  # fine grating
    return np.stack([0.8 - 0.3 * t, 0.35 + 0.2 * t, 0.75 * t + 0.15],
                    axis=-1)


def _sky(d):
    """View-direction gradient sky (out-of-model background)."""
    t = np.clip(-d[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    horizon = np.array([0.85, 0.8, 0.7])
    zenith = np.array([0.25, 0.45, 0.8])
    return horizon * (1.0 - t) + zenith * t


def render_view(T_pointcloud_camera: np.ndarray, intrinsics: np.ndarray,
                height: int, width: int, detail: int = 0) -> np.ndarray:
    """Ray-trace one view. T_pointcloud_camera = camera-to-world 4x4 (the
    dataset convention, reference: ImagePoseDataset.py:20-26). Returns
    (H, W, 3) float32 in [0, 1]."""
    R = T_pointcloud_camera[:3, :3]
    eye = T_pointcloud_camera[:3, 3]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    u, v = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    d_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)
    d = d_cam @ R.T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)      # (H, W, 3)

    best_t = np.full((height, width), np.inf)
    color = _sky(d).astype(np.float64)

    # ground plane y = GROUND_Y (normal -y pointing up toward cameras)
    dy = d[..., 1]
    tp = np.where(np.abs(dy) > 1e-9, (GROUND_Y - eye[1]) / dy, np.inf)
    hit_p = eye + d * tp[..., None]
    ground_ok = (tp > 1e-4) & (np.hypot(hit_p[..., 0], hit_p[..., 2])
                               < GROUND_RADIUS)
    tex = _checker(hit_p[..., 0], hit_p[..., 2], detail)
    n = np.broadcast_to(np.array([0.0, -1.0, 0.0]), d.shape)
    shade = AMBIENT + DIFFUSE * np.maximum(0.0, n @ LIGHT_DIR)
    mask = ground_ok & (tp < best_t)
    best_t = np.where(mask, tp, best_t)
    color = np.where(mask[..., None], tex * shade[..., None], color)

    for center, radius, tex_id in SPHERES:
        oc = eye - center
        b = np.einsum("hwc,c->hw", d, oc)
        c0 = oc @ oc - radius * radius
        disc = b * b - c0
        ok = disc > 0
        ts = -b - np.sqrt(np.maximum(disc, 0.0))
        ok &= ts > 1e-4
        hit = eye + d * ts[..., None]
        n = (hit - center) / radius
        tex = _sphere_texture(tex_id, n, detail)
        shade = AMBIENT + DIFFUSE * np.maximum(
            0.0, np.einsum("hwc,c->hw", n, LIGHT_DIR))
        mask = ok & (ts < best_t)
        best_t = np.where(mask, ts, best_t)
        color = np.where(mask[..., None], tex * shade[..., None], color)

    return np.clip(color, 0.0, 1.0).astype(np.float32)


def orbit_pose(angle: float, elev: float, radius: float = 3.2,
               look_at=(0.0, 0.45, 0.0)) -> np.ndarray:
    """Camera-to-world pose orbiting `look_at` (y-down convention: negative
    elevation raises the camera)."""
    look_at = np.asarray(look_at, np.float64)
    eye = look_at + np.array([radius * np.cos(elev) * np.sin(angle),
                              -radius * np.sin(elev),
                              -radius * np.cos(elev) * np.cos(angle)])
    forward = look_at - eye
    forward /= np.linalg.norm(forward)
    up = np.array([0.0, -1.0, 0.0])  # world up is -y (y-down convention)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)  # right x down = forward (right-handed)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, forward, eye
    return T


def sample_init_points(n_points: int, rng: np.random.Generator,
                       noise: float = 0.02, detail: int = 0):
    """COLMAP-like sparse initialization: points sampled from the true
    surfaces with jitter, colored by the local texture (drives the SH DC
    color init exactly like a COLMAP parquet with r,g,b columns,
    reference: GaussianPointCloudScene.py:116-127)."""
    areas = [GROUND_RADIUS ** 2 * 0.5]  # ground gets half the budget
    areas += [4 * np.pi * r * r for _, r, _ in SPHERES]
    areas = np.asarray(areas) / np.sum(areas)
    counts = (areas * n_points).astype(int)
    counts[0] = n_points - counts[1:].sum()
    pts, cols = [], []

    # ground: denser near the center (where the objects are)
    ng = counts[0]
    rr = GROUND_RADIUS * np.sqrt(rng.random(ng)) * rng.uniform(0.35, 1.0, ng)
    th = rng.uniform(0, 2 * np.pi, ng)
    gx, gz = rr * np.cos(th), rr * np.sin(th)
    gp = np.stack([gx, np.full(ng, GROUND_Y), gz], -1)
    shade = AMBIENT + DIFFUSE * 0.8
    pts.append(gp)
    cols.append(np.clip(_checker(gx, gz, detail) * shade, 0, 1))

    for (center, radius, tex_id), cnt in zip(SPHERES, counts[1:]):
        v = rng.normal(size=(cnt, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sp = center + v * radius
        shade = AMBIENT + DIFFUSE * np.maximum(0.0, v @ LIGHT_DIR)
        pts.append(sp)
        cols.append(np.clip(_sphere_texture(tex_id, v, detail)
                            * shade[:, None], 0, 1))

    pc = np.concatenate(pts).astype(np.float32)
    pc += rng.normal(scale=noise, size=pc.shape).astype(np.float32)
    rgb = np.concatenate(cols).astype(np.float32)
    return pc, rgb
