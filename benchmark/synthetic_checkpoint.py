"""Synthetic checkpoints with REAL-checkpoint statistics, for scale benches.

The 430k bench scene is uniform-random: every splat is small and overlap
statistics are benign. Real trained checkpoints (the reference benchmarks
official-implementation checkpoints at 1.03M and 2.08M points, reference:
benchmark/README.md:3,8,31-32) are very different:

- positions CLUSTER on surfaces: dense blobs where geometry is, sparse
  in-between, plus a far background shell;
- log-scales are roughly NORMAL (so scales are LOG-NORMAL, heavy-tailed):
  most splats are small on-surface discs, but a long tail of big low-alpha
  splats covers tens to hundreds of tiles each - exactly the splats that
  stress the mid/big pools and the per-point tile cap;
- alphas are bimodal: a near-opaque surface mode and a translucent haze
  mode (trained checkpoints keep many low-alpha gaussians around).

This module builds such a scene procedurally so `bench.py` can measure at
any point count without shipping checkpoint files:
  BENCH_SCENE_KIND=heavy BENCH_POINTS=2080000 python bench.py
"""

from __future__ import annotations

import numpy as np

# scene envelope sized so the default bench camera at the origin looking +z
# (976x544, fx=581.7, near 0.4 / far 1000) sees most of the cloud - matched
# to bench.py's camera, not to any particular capacity budget
SCENE_DEPTH_RANGE = (2.0, 60.0)
SCENE_XY_HALF = (30.0, 20.0)


def make_heavy_tailed_checkpoint(n: int, rng: np.random.Generator):
    """Positions (n, 3) float32 + features (n, 56) float32 with clustered
    geometry and log-normal scale statistics. Deterministic given `rng`."""
    n_bg = max(int(n * 0.02), 1)        # big background splats
    n_haze = max(int(n * 0.08), 1)      # diffuse mid-size haze
    n_surf = n - n_bg - n_haze          # clustered surface splats

    # --- clustered surface points: Gaussian mixture over ~256 clusters
    # whose own radii are log-normal (big and small structures coexist)
    k = 256
    centers = np.stack([
        rng.uniform(-SCENE_XY_HALF[0] * 0.8, SCENE_XY_HALF[0] * 0.8, k),
        rng.uniform(-SCENE_XY_HALF[1] * 0.8, SCENE_XY_HALF[1] * 0.8, k),
        rng.uniform(*SCENE_DEPTH_RANGE, k)], 1)
    cluster_r = np.exp(rng.normal(-0.3, 0.9, k))        # median ~0.74 units
    # cluster weights ~ Zipf-ish: some clusters hold far more points
    wts = rng.pareto(1.3, k) + 0.05
    wts /= wts.sum()
    assign = rng.choice(k, size=n_surf, p=wts)
    surf = (centers[assign]
            + rng.normal(size=(n_surf, 3)) * cluster_r[assign][:, None])
    # surface splat world scale tracks its cluster size (small structures
    # have small splats) with log-normal spread
    surf_log_s = (np.log(cluster_r[assign] * 0.02)[:, None]
                  + rng.normal(0.0, 0.7, (n_surf, 3)))

    # --- haze: uniform fill, mid scales
    haze = np.stack([
        rng.uniform(-SCENE_XY_HALF[0], SCENE_XY_HALF[0], n_haze),
        rng.uniform(-SCENE_XY_HALF[1], SCENE_XY_HALF[1], n_haze),
        rng.uniform(*SCENE_DEPTH_RANGE, n_haze)], 1)
    haze_log_s = rng.normal(-1.8, 0.6, (n_haze, 3))

    # --- background shell: few, huge, translucent (the pool-stressing tail)
    phi = rng.uniform(0, 2 * np.pi, n_bg)
    cos_t = rng.uniform(-0.3, 0.9, n_bg)       # biased into the frustum
    sin_t = np.sqrt(1.0 - cos_t ** 2)
    r_bg = rng.uniform(50.0, 90.0, n_bg)
    bg = np.stack([r_bg * sin_t * np.cos(phi),
                   r_bg * sin_t * np.sin(phi) * 0.6,
                   r_bg * cos_t + 30.0], 1)
    bg_log_s = rng.normal(0.8, 0.5, (n_bg, 3))

    pc = np.concatenate([surf, haze, bg]).astype(np.float32)
    log_s = np.concatenate([surf_log_s, haze_log_s, bg_log_s])
    # mild anisotropy (trained splats are disc-like: one axis shrunk)
    flat_axis = rng.integers(0, 3, n)
    log_s[np.arange(n), flat_axis] -= np.abs(rng.normal(0.8, 0.4, n))

    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = np.clip(log_s, -8.0, 3.0)
    # bimodal alpha: opaque surface mode, translucent haze/background mode
    opaque = rng.random(n) < 0.55
    feats[:, 7] = np.where(opaque, rng.normal(2.5, 1.0, n),
                           rng.normal(-2.0, 1.0, n))
    # SH: strong DC, decaying higher bands (trained checkpoints carry
    # non-trivial band 1-3 energy; include it so the color path is honest)
    for base in (8, 24, 40):
        feats[:, base] = rng.normal(0.0, 1.0, n)
        feats[:, base + 1:base + 4] = rng.normal(0.0, 0.25, (n, 3))
        feats[:, base + 4:base + 9] = rng.normal(0.0, 0.1, (n, 5))
        feats[:, base + 9:base + 16] = rng.normal(0.0, 0.04, (n, 7))
    return pc, feats
