"""mip-NeRF-360-style ellipse camera path generator.

Implements the published multinerf/mip-NeRF-360 novel-view path recipe
(also used by the reference's tools/generate_ellipse_path.py) in vectorized
numpy: bring the training poses into a canonical z-up frame, locate the
scene focus point as the least-squares intersection of the camera optical
axes, fit a percentile ellipse around it, and emit `n_frames` look-at poses
mapped back to the dataset's OpenCV convention. Output is .npy (plus .pt if
torch is importable) for the offline renderer.
"""

import argparse
import json

import numpy as np

# OpenCV (x right, y down, z forward) <-> OpenGL-style (multinerf) pose
# convention: swap the first two axes rows and flip signs. Applying the
# same permutation/sign pattern twice is the identity, so one constant
# serves both directions.
_AXIS_PERM = np.array([1, 0, 2, 3])


def _flip_convention(c2w_batch):
    out = c2w_batch.copy()
    out[:, 0:3, 1:3] *= -1
    out = out[:, _AXIS_PERM, :]
    out[:, 2, :] *= -1
    return out


def _flip_convention_back(c2w_batch):
    out = c2w_batch.copy()
    out[:, 2, :] *= -1
    out = out[:, _AXIS_PERM, :]
    out[:, 0:3, 1:3] *= -1
    return out


def _unit(v, axis=-1):
    return v / np.linalg.norm(v, axis=axis, keepdims=True)


def scene_focus_point(poses):
    """Least-squares point closest to every camera's optical axis.

    Minimizes sum_i |(I - d_i d_i^T)(p - o_i)|^2 over p, with d_i the
    view direction and o_i the camera origin (the normal equations of the
    classic multi-line intersection problem)."""
    d = poses[:, :3, 2]                       # (N, 3) axis directions
    o = poses[:, :3, 3]                       # (N, 3) origins
    proj = np.eye(3)[None] - d[:, :, None] * d[:, None, :]   # (N, 3, 3)
    lhs = proj.sum(axis=0)
    rhs = np.einsum("nij,nj->i", proj, o)
    return np.linalg.lstsq(lhs, rhs, rcond=None)[0]


def _rodrigues_to_z_up(up):
    """Rotation carrying the mean camera up-vector onto +z (Rodrigues)."""
    a = _unit(up)
    b = np.array([0.0, 0.0, 1.0])
    c = float(a @ b)
    if c < -1 + 1e-8:  # antipodal: nudge off the singularity
        a = _unit(a + (np.random.default_rng(0).random(3) - 0.5) * 0.01)
        c = float(a @ b)
    v = np.cross(a, b)
    s2 = float(v @ v)
    skew = np.array([[0.0, -v[2], v[1]],
                     [v[2], 0.0, -v[0]],
                     [-v[1], v[0], 0.0]])
    return np.eye(3) + skew + skew @ skew * ((1 - c) / (s2 + 1e-8))


def canonicalize(poses):
    """Center the camera cloud at the origin and rotate mean-up to +z.

    Returns (canonical_poses, world_from_canonical 4x4)."""
    rotation = _rodrigues_to_z_up(poses[:, :3, 1].mean(axis=0))
    shift = -rotation @ poses[:, :3, 3].mean(axis=0)
    T = np.eye(4)
    T[:3, :3] = rotation
    T[:3, 3] = shift
    return T[None] @ poses, np.linalg.inv(T)


def lookat_poses(positions, target, up):
    """Batched 3x4 look-at matrices. In the canonical (OpenGL-style) frame
    the camera looks along -z, so the +z column points from the target out
    through the camera."""
    fwd = _unit(positions - target[None])
    right = _unit(np.cross(np.broadcast_to(up, fwd.shape), fwd))
    down = _unit(np.cross(fwd, right))
    return np.stack([right, down, fwd, positions], axis=-1)  # (N, 3, 4)


def ellipse_positions(poses, n_frames, z_variation=0.0, z_phase=0.0):
    """Percentile-fit ellipse around the focus point (published recipe:
    90th-percentile |offset| in xy, 10th..90th band in z)."""
    center = scene_focus_point(poses)
    flat_center = np.array([center[0], center[1], 0.0])
    origins = poses[:, :3, 3]
    radius = np.percentile(np.abs(origins - flat_center), 90, axis=0)
    lo = flat_center - radius
    hi = flat_center + radius
    z_lo = np.percentile(origins, 10, axis=0)
    z_hi = np.percentile(origins, 90, axis=0)

    t = np.linspace(0.0, 2 * np.pi, n_frames, endpoint=False)
    cos01 = 0.5 * np.cos(t) + 0.5
    sin01 = 0.5 * np.sin(t) + 0.5
    zcos01 = 0.5 * np.cos(t + 2 * np.pi * z_phase) + 0.5
    xyz = np.stack([
        lo[0] + (hi[0] - lo[0]) * cos01,
        lo[1] + (hi[1] - lo[1]) * sin01,
        z_variation * (z_lo[2] + (z_hi[2] - z_lo[2]) * zcos01),
    ], axis=-1)
    return xyz, center


def build_path(poses_cv, n_frames=120, z_variation=0.0, z_phase=0.0):
    """train poses (N, 4, 4) OpenCV -> (n_frames, 4, 4) OpenCV path."""
    canonical, world_from_canon = canonicalize(_flip_convention(poses_cv))
    positions, center = ellipse_positions(canonical[:, :3, :], n_frames,
                                          z_variation, z_phase)
    mean_up = canonical[:, :3, 1].mean(axis=0)
    dominant = int(np.argmax(np.abs(mean_up)))
    up = np.eye(3)[dominant] * np.sign(mean_up[dominant])
    path34 = lookat_poses(positions, center, up)
    path = np.tile(np.eye(4), (n_frames, 1, 1))
    path[:, :3, :] = path34
    return _flip_convention_back(world_from_canon[None] @ path).astype(
        np.float32)


def main():
    parser = argparse.ArgumentParser(
        "Generate ellipse path from training cameras")
    parser.add_argument("--cameras", type=str, required=True,
                        help="train.json with camera poses")
    parser.add_argument("--output", type=str, default="ellipse_poses")
    parser.add_argument("--n_frames", type=int, default=120)
    parser.add_argument("--z_variation", type=float, default=0.0)
    args = parser.parse_args()

    with open(args.cameras) as f:
        cameras_json = json.load(f)
    poses = np.array([c["T_pointcloud_camera"] for c in cameras_json],
                     np.float64).reshape(-1, 4, 4)
    path = build_path(poses, n_frames=args.n_frames,
                      z_variation=args.z_variation)
    np.save(args.output + ".npy", path)
    print(f"wrote {args.output}.npy ({len(path)} poses)")
    try:
        import torch
        torch.save(torch.from_numpy(path), args.output + ".pt")
        print(f"wrote {args.output}.pt")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
