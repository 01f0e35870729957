"""Self-healing capacity: a scene that outgrows its binning budgets must
recover with ONE re-probe + recompile and continue with zero dropped work.

The reference never faces this (its CUDA pipeline allocates the key buffer
per frame, reference: GaussianPointCloudRasterisation.py:927-931); our
static budgets can be outgrown by densification, so the trainer re-derives
them from the live scene when the overflow guard trips persistently
(training/trainer.py:_recover_capacity).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_trainer_e2e import _make_synthetic_dataset  # noqa: E402

from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    GaussianPointCloudTrainer, TrainConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    AdaptiveControllerConfig)
from taichi_3d_gaussian_splatting_tpu.training.loss import LossFunctionConfig


def test_escalate_budgets_grows_the_firing_dimension():
    """When the re-probe can't see the overflowing poses, recovery must
    still grow the budgets the counters prove are short (observed on the
    round-4 campaign: a probe-blind no-op recovery)."""
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        _escalate_budgets)
    rc = RasterizerConfig(max_keys=1024, pool_slots=(4, 16),
                          pool_caps=(100, 10))
    n = 150
    grown = _escalate_budgets(rc, big_ovf=5, key_ovf=0, tile_ovf=False, n=n)
    assert grown.pool_caps == (150, 20)  # doubled, clamped to n
    assert grown.max_keys == 1024 and grown.pool_slots == (4, 16)
    grown = _escalate_budgets(rc, big_ovf=0, key_ovf=9, tile_ovf=False, n=n)
    assert grown.max_keys == 1536 and grown.pool_caps == (100, 10)
    grown = _escalate_budgets(rc, big_ovf=0, key_ovf=0, tile_ovf=True, n=n)
    assert grown.pool_slots == (4, 16, 32)
    assert grown.pool_caps == (100, 10, 64)


def test_overflow_checks_skip_stale_pre_recovery_counters():
    """Counters flushed for iterations dispatched before a recovery's
    rebuild must not feed strikes (they'd trigger a no-op recompile)."""
    trainer = GaussianPointCloudTrainer.__new__(GaussianPointCloudTrainer)
    trainer.config = TrainConfig(capacity_recovery=False,
                                 fail_on_capacity_overflow=False)
    trainer._overflow_strikes = 0
    trainer._overflow_ignore_until = 120

    class _NullLogger:
        def scalars(self, *a, **k):
            pass
    trainer.logger = _NullLogger()
    bad = {"big_point_overflow": 9.0, "key_overflow": 0.0,
           "tile_cap_overflow": 0.0, "total_keys": 100.0}
    trainer._check_capacity_overflow(110, bad)   # stale: ignored
    trainer._check_capacity_overflow(120, bad)   # boundary: ignored
    assert trainer._overflow_strikes == 0
    trainer._check_capacity_overflow(130, bad)   # fresh: counts
    assert trainer._overflow_strikes == 1


def test_recovery_suppressed_in_the_tail_window():
    """A reactive recovery inside the final recovery_tail_fraction of the
    run must be suppressed (a multi-minute recompile to stop a counted
    drizzle of overflow for a few hundred iterations is always a bad
    trade - observed live on the round-5 campaign at iteration ~29.4k of
    30k), while the same strikes BEFORE the tail window still recover."""
    calls = []

    class _NullLogger:
        def scalars(self, *a, **k):
            pass

    def make(num_iterations):
        t = GaussianPointCloudTrainer.__new__(GaussianPointCloudTrainer)
        t.config = TrainConfig(capacity_recovery=True,
                               fail_on_capacity_overflow=False,
                               num_iterations=num_iterations,
                               recovery_tail_fraction=0.02)
        t._overflow_strikes = 0
        t._overflow_ignore_until = -1
        t._recovery_tail_suppressed = False
        t.logger = _NullLogger()
        t._recover_capacity = (
            lambda iteration, *a, **k: calls.append(iteration))
        return t

    bad = {"big_point_overflow": 2.0, "key_overflow": 0.0,
           "tile_cap_overflow": 26.0, "total_keys": 940312.0}

    # inside the tail (30000 * 0.02 = 600): 3 strikes -> suppressed
    t = make(30000)
    for it in (29410, 29420, 29430):
        t._check_capacity_overflow(it, bad)
    assert calls == []
    assert t._recovery_tail_suppressed

    # before the tail: 3 strikes -> recovery fires as before
    t = make(30000)
    for it in (10010, 10020, 10030):
        t._check_capacity_overflow(it, bad)
    assert calls == [10030]


@pytest.mark.slow
def test_capacity_recovery_end_to_end(tmp_path):
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=41,
        val_interval=10 ** 6,
        initial_downsample_factor=1,
        log_loss_interval=5,
        log_image_interval=10 ** 9,
        save_full_checkpoint=False,
        overflow_check_interval=5,
        capacity_recovery=True,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            near_plane=0.1, far_plane=100.0, max_tiles_per_point=8,
            # deliberately undersized pool ladder: the many multi-tile
            # splats from the huge init covariance cannot all fit, so
            # big_point_overflow > 0 on every early check
            big_point_divisor=10 ** 6, mid_point_divisor=10 ** 6),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=10 ** 6,
            num_iterations_reset_alpha=10 ** 6),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=1.5, initial_alpha=1.0,
            initial_covariance_ratio=50.0, max_initial_covariance=100.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    old_rc = config.rasterisation_config
    trainer.train()  # must NOT raise: recovery instead of warn-or-die

    new_rc = trainer.config.rasterisation_config
    # budgets grew from the live-scene re-probe (monotonic merge)
    assert new_rc is not old_rc
    assert sum(new_rc.pool_caps) > sum(old_rc.pool_caps), (
        old_rc.pool_caps, new_rc.pool_caps)
    assert new_rc.max_keys >= old_rc.max_keys

    # before recovery: dropped work; after: ZERO dropped work
    recovery_iter = None
    overflow_by_iter = {}
    with open(os.path.join(config.summary_writer_log_dir,
                           "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train/capacity_recovery_max_keys" in rec:
                recovery_iter = rec["iteration"]
            if "train/big_point_overflow" in rec:
                overflow_by_iter[rec["iteration"]] = (
                    rec["train/big_point_overflow"]
                    + rec.get("train/key_overflow", 0.0)
                    + rec["train/tile_cap_overflow"])
    assert recovery_iter is not None, "recovery never triggered"
    pre = [v for it, v in overflow_by_iter.items() if it <= recovery_iter]
    post = [v for it, v in overflow_by_iter.items() if it > recovery_iter]
    assert pre and max(pre) > 0, overflow_by_iter
    assert post and max(post) == 0, overflow_by_iter
    # exactly one recompile cycle: strikes reset, no further escalation
    assert trainer._overflow_strikes == 0


def test_recovery_merge_covers_resolved_legacy_pools():
    """A recovery probe on a legacy config (empty pool_slots) must merge
    against the RESOLVED divisor-derived tiers, not the raw empty tuples -
    otherwise a small probed ladder silently SHRINKS effective capacity
    below what training already binned with (regression: a toy e2e run's
    loss stepped up after recovery replaced the legacy tiers)."""
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import resolve_pools
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer)

    trainer = GaussianPointCloudTrainer.__new__(GaussianPointCloudTrainer)
    n = 160
    old_rc = RasterizerConfig(max_keys=4096, max_tiles_per_point=16,
                              mid_point_divisor=4, big_point_divisor=16)
    trainer.config = TrainConfig(rasterisation_config=old_rc,
                                 capacity_recovery=True)
    trainer._overflow_strikes = 3
    trainer._overflow_ignore_until = -1
    trainer._last_flush_iteration = 10
    trainer._step_fns = {"stale": None}

    class _Scene:
        capacity = n
    trainer.scene = _Scene()

    class _NullLogger:
        def scalars(self, *a, **k):
            pass
    trainer.logger = _NullLogger()

    # the probe sees a tiny workload: a ladder far below the legacy tiers
    def fake_probe(probe_views=0):
        trainer.config.rasterisation_config = RasterizerConfig(
            max_keys=512, pool_slots=(4,), pool_caps=(8,))
    trainer._apply_auto_capacity = fake_probe

    trainer._recover_capacity(iteration=20, big_ovf=5.0)
    rc = trainer.config.rasterisation_config

    legacy = dict(resolve_pools(
        n, 1 << 30, old_rc.max_tiles_per_point, old_rc.big_point_divisor,
        old_rc.mid_point_divisor, old_rc.max_tiles_per_huge_point,
        old_rc.huge_pool_size))
    merged = dict(zip(rc.pool_slots, rc.pool_caps))
    for slots, cap in legacy.items():
        assert merged.get(slots, 0) >= cap, (legacy, merged)
    assert rc.max_keys >= old_rc.max_keys
    assert not trainer._step_fns  # rebuilt
    assert trainer._overflow_strikes == 0


def test_probe_ahead_grows_before_overflow(tmp_path):
    """Probe-ahead capacity (runs at validation boundaries): when the live
    scene's probed workload is within the margin of the budgets, recovery
    fires PROACTIVELY (recompile at the validation boundary) - and is a
    no-op right after init, when headroom >> margin."""
    import jax.numpy as jnp
    train_json, val_json, parquet = _make_synthetic_dataset(tmp_path)
    config = TrainConfig(
        train_dataset_json_path=train_json,
        val_dataset_json_path=val_json,
        pointcloud_parquet_path=parquet,
        num_iterations=100,
        auto_capacity=True,
        auto_capacity_headroom=2.0,
        capacity_probe_ahead=True,
        summary_writer_log_dir=str(tmp_path / "logs"),
        rasterisation_config=RasterizerConfig(
            near_plane=0.1, far_plane=100.0, max_tiles_per_point=8),
        gaussian_point_cloud_scene_config=SceneConfig(
            # room to grow: the probe-ahead growth must be representable
            # above the chunk-multiple floor of max_keys and the n-clamp
            # of pool caps
            max_num_points_ratio=8.0, initial_alpha=1.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    rc0 = trainer.config.rasterisation_config
    # fresh scene: probed workload x margin is well inside headroom
    trainer._probe_ahead_capacity(5)
    assert trainer.config.rasterisation_config is rc0

    # densification stand-in: activate every padded pool slot as a clone of
    # a live point (the 2x2 toy tile grid is already per-point saturated,
    # so the workload grows with the VALID population, not splat size)
    import numpy as np
    scene = trainer.scene
    src = int(np.argmin(np.asarray(scene.point_invalid_mask)))
    pc = jnp.where(scene.point_invalid_mask[:, None] != 0,
                   scene.point_cloud[src], scene.point_cloud)
    feats = jnp.where(scene.point_invalid_mask[:, None] != 0,
                      scene.point_cloud_features[src],
                      scene.point_cloud_features)
    trainer.scene = scene._replace(
        point_cloud=pc, point_cloud_features=feats,
        point_invalid_mask=jnp.zeros_like(scene.point_invalid_mask))
    trainer._step_fns["sentinel"] = object()
    trainer._probe_ahead_capacity(5)
    rc1 = trainer.config.rasterisation_config
    assert rc1.max_keys > rc0.max_keys or \
        sum(rc1.pool_caps) > sum(rc0.pool_caps), (rc0, rc1)
    assert "sentinel" not in trainer._step_fns, "steps must be rebuilt"
