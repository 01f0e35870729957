"""mip-NeRF-360-style ellipse camera path generator.

Rebuild of reference tools/generate_ellipse_path.py in pure numpy:
auto-orient/center the training poses (up-vector method), find the focus
point, fit a percentile ellipse around it, and emit `n_frames` look-at poses
back in the original (OpenCV) convention. Output is saved as .npy (and .pt if
torch is available) for the offline renderer.
"""

import argparse
import json

import numpy as np

K_FOCAL = 581.743
K_WIDTH = 980
K_HEIGHT = 546


def normalize(x):
    return x / np.linalg.norm(x)


def pose_opencv_to_opengl(c2w):
    """reference: :15-20."""
    c2w = c2w.copy()
    c2w[:, 0:3, 1:3] *= -1
    c2w = c2w[:, np.array([1, 0, 2, 3]), :]
    c2w[:, 2, :] *= -1
    return c2w


def pose_opengl_to_opencv(c2w):
    c2w = c2w.copy()
    c2w[:, 2, :] *= -1
    c2w = c2w[:, np.array([1, 0, 2, 3]), :]
    c2w[:, 0:3, 1:3] *= -1
    return c2w


def viewmatrix(lookdir, up, position):
    """Look-at 3x4 view matrix (reference: :31-47)."""
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def focus_point_fn(poses):
    """Nearest point to all focal axes (reference: :49-55)."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def rotation_matrix_between(a, b):
    """Rotation taking unit vector a to b (reference: :121-146)."""
    a, b = normalize(a), normalize(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:
        eps = (np.random.default_rng(0).random(3) - 0.5) * 0.01
        return rotation_matrix_between(a + eps, b)
    s = np.linalg.norm(v)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * ((1 - c) / (s ** 2 + 1e-8))


def auto_orient_and_center_poses(poses):
    """'up' method + 'poses' centering (the reference defaults, :150-250)."""
    origins = poses[:, :3, 3]
    translation = origins.mean(0)
    up = normalize(poses[:, :3, 1].mean(0))
    rotation = rotation_matrix_between(up, np.array([0.0, 0.0, 1.0]))
    transform = np.concatenate(
        [rotation, rotation @ -translation[:, None]], axis=-1)  # (3, 4)
    oriented = np.einsum("ij,njk->nik",
                         np.vstack([transform, [0, 0, 0, 1]]), poses)
    transform4 = np.vstack([transform, [0, 0, 0, 1]])
    return oriented, transform4


def generate_ellipse_path(poses, n_frames=120, z_variation=0.0, z_phase=0.0):
    """reference: :57-119."""
    center = focus_point_fn(poses)
    offset = np.array([center[0], center[1], 0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    low = -sc + offset
    high = sc + offset
    z_low = np.percentile(poses[:, :3, 3], 10, axis=0)
    z_high = np.percentile(poses[:, :3, 3], 90, axis=0)

    theta = np.linspace(0, 2 * np.pi, n_frames + 1, endpoint=True)
    positions = np.stack([
        low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
        low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
        z_variation * (z_low[2] + (z_high - z_low)[2]
                       * (np.cos(theta + 2 * np.pi * z_phase) * 0.5 + 0.5)),
    ], -1)[:-1]

    avg_up = normalize(poses[:, :3, 1].mean(0))
    ind_up = int(np.argmax(np.abs(avg_up)))
    up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])
    return np.stack([viewmatrix(p - center, up, p) for p in positions])


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

    poses_gl = pose_opencv_to_opengl(poses)
    oriented, transform = auto_orient_and_center_poses(poses_gl)
    ellipse_34 = generate_ellipse_path(oriented[:, :3, :],
                                       n_frames=args.n_frames,
                                       z_variation=args.z_variation)
    ellipse = np.tile(np.eye(4), (len(ellipse_34), 1, 1))
    ellipse[:, :3, :] = ellipse_34
    ellipse = np.linalg.inv(transform)[None] @ ellipse
    ellipse = pose_opengl_to_opencv(ellipse).astype(np.float32)

    np.save(args.output + ".npy", ellipse)
    print(f"wrote {args.output}.npy ({len(ellipse)} poses)")
    try:
        import torch
        torch.save(torch.from_numpy(ellipse), args.output + ".pt")
        print(f"wrote {args.output}.pt")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
