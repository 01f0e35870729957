"""The heavy-tailed scale-bench scene must actually have real-checkpoint
statistics - clustered positions, log-normal scale tail, bimodal alpha -
or the 1M/2M benchmark numbers would be measured on a benign workload."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmark"))

from synthetic_checkpoint import make_heavy_tailed_checkpoint  # noqa: E402


def test_heavy_tailed_statistics():
    n = 50_000
    pc, feats = make_heavy_tailed_checkpoint(n, np.random.default_rng(0))
    assert pc.shape == (n, 3) and feats.shape == (n, 56)
    assert np.isfinite(pc).all() and np.isfinite(feats).all()

    # quats are unit
    np.testing.assert_allclose(
        np.linalg.norm(feats[:, 0:4], axis=1), 1.0, atol=1e-5)

    # scale tail is genuinely heavy: the largest splats dwarf the median
    # (log-normal signature; uniform-random scenes have ratio ~2)
    s_max = np.exp(feats[:, 4:7]).max(axis=1)
    ratio = np.quantile(s_max, 0.999) / np.median(s_max)
    assert ratio > 30.0, ratio

    # positions cluster: nearest-cluster-free proxy - the variance of local
    # density is far above a uniform cloud's. Compare counts in coarse
    # voxels against a uniform shuffle of the same envelope.
    def voxel_count_var(p):
        edges = [np.linspace(p[:, i].min(), p[:, i].max() + 1e-6, 9)
                 for i in range(3)]
        idx = sum(np.digitize(p[:, i], edges[i]) * (10 ** (2 * i))
                  for i in range(3))
        _, counts = np.unique(idx, return_counts=True)
        return counts.var() / max(counts.mean(), 1.0)

    rng = np.random.default_rng(1)
    uniform = np.stack([rng.uniform(pc[:, i].min(), pc[:, i].max(), n)
                        for i in range(3)], 1)
    assert voxel_count_var(pc) > 5.0 * voxel_count_var(uniform)

    # alpha is bimodal: both a near-opaque and a translucent mode populated
    alpha = feats[:, 7]
    assert (alpha > 1.0).mean() > 0.2
    assert (alpha < -1.0).mean() > 0.2

    # deterministic given the seed
    pc2, feats2 = make_heavy_tailed_checkpoint(n, np.random.default_rng(0))
    np.testing.assert_array_equal(pc, pc2)
    np.testing.assert_array_equal(feats, feats2)
