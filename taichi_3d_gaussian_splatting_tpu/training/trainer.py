"""Training loop: the TPU rebuild of `GaussianPointCloudTrainer`
(reference: GaussianPointTrainer.py).

Reference semantics preserved:
- two Adam chains: features at `feature_learning_rate`, positions at
  `position_learning_rate` with exponential decay applied every
  `position_learning_rate_decay_interval` iterations (reference: :126-132,
  183-184)
- coarse-to-fine: start at `initial_downsample_factor`, halve every
  `half_downsample_factor_interval` iterations (reference: :133,139-148)
- SH band curriculum `iteration // increase_color_max_sh_band_interval`
  (reference: :163), implemented as a mask input so it never recompiles
- per-group gradient scaling + SH band gradient masking applied to the
  rasterizer-path feature gradients only (reference:
  GaussianPointCloudRasterisation.py:1102-1125)
- the stored quaternion is re-normalized at the top of every step (the
  reference normalizes it in place inside the forward kernel, reference:
  GaussianPointCloudRasterisation.py:197-205,264)
- adaptive controller: statistics accumulate inside the step; densify runs
  every `num_iterations_densify` after warm-up using the trigger step's
  pre-optimizer positions; alpha reset every `num_iterations_reset_alpha`
  (reference: GaussianPointAdaptiveController.py)
- validation every `val_interval` plus hard-coded iterations 5000/7000
  (reference: :266), writing scene_{it}.parquet and best_scene.parquet
  (reference: :410-415)
- loss-spike detector: loss > 1.5x rolling-100 mean flags a problematic
  iteration (reference: :233-238)

TPU-native differences:
- one jitted step per (H, W) shape; the downsample schedule touches only ~3
  shapes so at most 3 executables are compiled (SURVEY.md section 7)
- Adam state is NOT reset when densification reuses an invalid slot - the
  reference's optimizers keep per-slot moments across refills too
  (reference: GaussianPointAdaptiveController.py:290-353 mutates parameter
  storage in place under torch.no_grad)
"""

from __future__ import annotations

import collections
import dataclasses
import json
import math
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as config_io
from ..camera import CameraInfo
from ..data.dataset import ImagePoseDataset, PrefetchLoader, DatasetItem
from ..models.scene import GaussianPointCloudScene, SceneConfig
from ..ops.rasterizer import RasterizerConfig, rasterize, rasterize_with_vjp
from ..ops.sh import feature_sh_band_mask
from .checkpoint import load_checkpoint, save_checkpoint
from .controller import (AdaptiveControllerConfig, ControllerState,
                         densify_step, reset_alpha, update_stats)
from .loss import LossFunction, LossFunctionConfig
from .ssim import psnr as psnr_fn


@dataclasses.dataclass
class TrainConfig:
    """reference: GaussianPointTrainer.py:32-58 (same YAML schema)."""
    train_dataset_json_path: str = ""
    val_dataset_json_path: str = ""
    pointcloud_parquet_path: str = ""
    num_iterations: int = 300000
    val_interval: int = 1000
    feature_learning_rate: float = 1e-3
    position_learning_rate: float = 1e-5
    position_learning_rate_decay_rate: float = 0.97
    position_learning_rate_decay_interval: int = 100
    increase_color_max_sh_band_interval: int = 1000
    log_loss_interval: int = 10
    log_metrics_interval: int = 100
    print_metrics_to_console: bool = False
    log_image_interval: int = 1000
    enable_taichi_kernel_profiler: bool = False  # YAML compat; no-op on TPU
    log_taichi_kernel_profile_interval: int = 1000
    log_validation_image: bool = True
    initial_downsample_factor: int = 4
    half_downsample_factor_interval: int = 250
    summary_writer_log_dir: str = "logs"
    output_model_dir: Optional[str] = None
    seed: int = 0
    # full-state checkpointing (scene + optimizer + controller + iteration);
    # the reference can only restart from the scene parquet (SURVEY.md sec. 5)
    save_full_checkpoint: bool = True
    resume_from_checkpoint: str = ""
    # jax profiler capture (TPU analog of the reference's Taichi kernel
    # profiler toggle, reference: GaussianPointTrainer.py:119,217-219);
    # writes an xprof trace under <summary_writer_log_dir>/profile
    enable_profiler: bool = False
    profiler_start_iteration: int = 100
    profiler_num_steps: int = 5
    # continuous capacity-overflow guard (the reference has no equivalent;
    # its dynamic allocation cannot overflow - our static budgets can, so
    # they are watched at a cadence, reference design note: SURVEY.md sec. 7)
    overflow_check_interval: int = 10
    # derive the binning budgets (max_keys + pool ladder) from the initial
    # scene at trainer init instead of hand-set YAML knobs: probes
    # `auto_capacity_probe_views` dataset poses and applies
    # `auto_capacity_headroom` (generous by default - densification grows
    # the workload over training; the overflow guard watches the drift)
    auto_capacity: bool = False
    auto_capacity_headroom: float = 2.0
    auto_capacity_probe_views: int = 4
    fail_on_capacity_overflow: bool = False
    # self-healing capacity: when the overflow guard sees 3 consecutive bad
    # checks (densification outgrew the budgets), re-probe the CURRENT scene
    # and rebuild the jitted steps with grown budgets instead of warning
    # forever / dying. Costs one full recompile per recovery (minutes on the
    # TPU backend at production scale - see benchmark/README.md), so budgets
    # only ever grow (monotonic merge) to prevent recompile churn.
    capacity_recovery: bool = True
    # a reactive recovery pays a full recompile (tens of minutes at
    # production scale) to stop dropped work for the REMAINING iterations -
    # a trade that is always bad near the end of the run (observed on the
    # round-5 campaign: a ~40 min recompile fired at iteration ~29.4k of
    # 30k over a counted drizzle of overflow). Within the final
    # `recovery_tail_fraction` of training the guard therefore keeps the
    # counted, non-silent overflow instead of recovering; probe-ahead
    # growth at validation boundaries is unaffected.
    recovery_tail_fraction: float = 0.02
    # probe-ahead capacity: at every validation boundary, re-probe the
    # CURRENT scene and pre-grow any budget within `margin` of its probed
    # peak (to the full auto_capacity_headroom). Recompiles then land at
    # validation boundaries (overlapping eval I/O) instead of mid-stepping
    # via the overflow guard; the guard stays on as the backstop.
    capacity_probe_ahead: bool = True
    capacity_probe_ahead_margin: float = 1.2
    # multi-chip data parallelism (beyond reference parity): views per
    # optimizer step, sharded over a 1-D device mesh. batch_size must be a
    # multiple of the mesh size; 1 keeps the reference's single-view step.
    # mesh_devices=0 uses every visible device (see parallel/sharding.py)
    batch_size: int = 1
    mesh_devices: int = 0
    # batch>1 quality honesty: one optimizer step consumes batch_size
    # images, so iteration-denominated schedules (densify cadence, alpha
    # reset, warm-up, SH unlock, downsample, position-LR decay) would fire
    # batch_size x less often per image seen - measured -2.1 dB at equal
    # images on the batch-parity protocol (benchmark/README.md). When
    # enabled (default), those schedules are divided by batch_size so their
    # per-IMAGE cadence matches the reference's single-view protocol.
    scale_schedules_with_batch: bool = True
    # learning-rate compensation for the batch_size x fewer optimizer steps
    # at equal images seen: "sqrt" multiplies both LRs by sqrt(batch_size)
    # (measured best on the batch-parity protocol: -3.03 -> -1.65 dB vs
    # single-view; "linear" measured -1.83 dB; "none" keeps raw LRs).
    # Gradients are SUMMED across the batch, but Adam's second-moment
    # normalization makes the update scale-invariant, so this is a real
    # step-size increase, not a renormalization.
    scale_lr_with_batch: str = "sqrt"   # none | sqrt | linear
    # Adam effective-horizon compensation for batch>1: raise the betas to
    # the batch_size'th power so the moment EMAs decay per IMAGE instead of
    # per step (0.9^B, 0.999^B). Measured on the batch-parity protocol
    # (benchmark/README.md): sqrt LR + betas = -1.20 dB vs single-view,
    # sqrt LR alone = -1.31 dB - a noise-level 0.11 dB gain, so it
    # defaults off; kept as a knob for longer-horizon workloads.
    scale_betas_with_batch: bool = False
    # device-side dataset cache: upload every (downsampled) training image
    # and pose ONCE per downsample factor, then index device arrays per
    # step. Host->device transfers through a remote-TPU tunnel cost ~65 ms
    # per call (measured; a per-iteration image upload would dominate the
    # ~10-50 ms step), so streaming is only used when images have mixed
    # shapes or the cache would exceed the byte budget.
    cache_dataset_on_device: bool = True
    # Morton-order the initial point pool (blend-slab gather locality; see
    # models/scene.py spatially_sorted). Order-invariant up to sort ties.
    spatial_sort: bool = True
    device_cache_max_bytes: int = 4 * 1024 ** 3
    rasterisation_config: RasterizerConfig = dataclasses.field(
        default_factory=RasterizerConfig)
    adaptive_controller_config: AdaptiveControllerConfig = dataclasses.field(
        default_factory=AdaptiveControllerConfig)
    gaussian_point_cloud_scene_config: SceneConfig = dataclasses.field(
        default_factory=SceneConfig)
    loss_function_config: LossFunctionConfig = dataclasses.field(
        default_factory=LossFunctionConfig)

    @staticmethod
    def from_yaml_file(path: str) -> "TrainConfig":
        return config_io.from_yaml_file(TrainConfig, path)

    def to_yaml_file(self, path: str):
        config_io.to_yaml_file(self, path)


def _grad_group_scale(config: RasterizerConfig) -> np.ndarray:
    """(56,) per-feature gradient scale vector (reference: :1105-1125)."""
    scale = np.full((56,), config.grad_high_order_color_factor, np.float32)
    scale[0:4] = config.grad_q_factor
    scale[4:7] = config.grad_s_factor
    scale[7] = config.grad_alpha_factor
    scale[8] = config.grad_color_factor
    scale[24] = config.grad_color_factor
    scale[40] = config.grad_color_factor
    return scale


def _escalate_budgets(rc, big_ovf: float, key_ovf: float, tile_ovf: bool,
                      n: int):
    """Forced budget growth when a capacity re-probe cannot reproduce the
    overflow (the probe samples a few poses; the drops happen on others).
    Grows only the dimension whose counter fired:

    - big_point_overflow: points beyond their pool's capacity -> double
      every pool cap (clamped to the scene capacity);
    - key_overflow: emitted keys beyond max_keys -> max_keys x 1.5;
    - tile_cap_overflow above threshold: bboxes truncated at the largest
      slot size -> append a tier with double the top slot count (clamped to
      the tile-grid size downstream at resolve time, ops/tiling.py).
    """
    caps = rc.pool_caps
    slots = rc.pool_slots
    max_keys = rc.max_keys
    tier_a_cap = rc.tier_a_cap
    if big_ovf > 0 and caps:
        caps = tuple(min(2 * c, n) for c in caps)
    if big_ovf > 0 and tier_a_cap:
        # tier-A drops also fire big_point_overflow (compacted tier A is a
        # pool, ops/tiling.py); 0 stays 0 (the uncapped dense layout)
        tier_a_cap = min(2 * tier_a_cap, n)
    if key_ovf > 0:
        chunk = int(rc.chunk)
        max_keys = ((int(max_keys * 1.5) + chunk - 1) // chunk) * chunk
    if tile_ovf and slots:
        slots = slots + (2 * slots[-1],)
        caps = caps + (max(caps[-1] if caps else 64, 64),)
    return dataclasses.replace(rc, max_keys=max_keys, pool_slots=slots,
                               pool_caps=caps, tier_a_cap=tier_a_cap)


def _downsample_item(item: DatasetItem, factor: int) -> DatasetItem:
    """Host-side image/camera downsample (reference: :97-116)."""
    if factor <= 1:
        return item
    import PIL.Image
    cam = item.camera_info.downsample(factor)
    pil = PIL.Image.fromarray((item.image * 255.0).astype(np.uint8))
    resized = pil.resize((item.camera_info.camera_width // factor,
                          item.camera_info.camera_height // factor),
                         PIL.Image.BILINEAR)
    arr = np.asarray(resized, np.float32)[:cam.camera_height,
                                          :cam.camera_width, :3] / 255.0
    return DatasetItem(np.ascontiguousarray(arr), item.q_pointcloud_camera,
                       item.t_pointcloud_camera, cam)


def _cache_image_to_float(x):
    """Device-cache image to f32 in [0, 1]. The cache stores uint8 (the
    data is PNG-sourced, and the downsampler already round-trips through
    uint8, so nothing is lost) because the upload rides the host->device
    link ONCE per downsample factor - through a remote-TPU tunnel at
    ~3 MB/s a 48-view 976x544 f32 stack is ~100 minutes, uint8 is 4x
    less. f32 stacks (streaming fallback, old checkpoints) pass through."""
    if x.dtype == jnp.uint8:
        # true division, NOT multiply-by-reciprocal: must be bit-identical
        # to the dataset loader's `png / 255.0`
        return x.astype(jnp.float32) / 255.0
    return x


class _LazyCacheImage:
    """Deferred fetch of a device-cached GT image (panel logging only) -
    materializing it every iteration would reintroduce the per-step device
    round trip the cache exists to avoid."""

    def __init__(self, stack, idx):
        self.stack = stack
        self.idx = idx

    def fetch(self):
        img = np.asarray(self.stack[int(self.idx)])
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        return img


class MetricsLogger:
    """JSONL + console + (optional) TensorBoard sinks. Console output uses
    the `key=value;` format the reference's CI scrapes
    (reference: :212-231,403-409; ci/run_experiment.py)."""

    def __init__(self, log_dir: str, print_to_console: bool,
                 enable_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.print_to_console = print_to_console
        self.tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self.tb = None

    def scalars(self, iteration: int, values: dict, console_keys=()):
        rec = {"iteration": iteration}
        rec.update({k: float(v) for k, v in values.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in values.items():
                self.tb.add_scalar(k, float(v), iteration)
        if self.print_to_console:
            for k in (console_keys or values.keys()):
                print(f"{k.replace('/', '_')}={float(values[k])};")

    def image(self, iteration: int, tag: str, image_hwc: np.ndarray):
        if self.tb is not None:
            self.tb.add_image(tag, np.transpose(
                np.clip(image_hwc, 0, 1), (2, 0, 1)), iteration)

    def histogram(self, iteration: int, tag: str, values: np.ndarray):
        if self.tb is not None:
            try:
                self.tb.add_histogram(tag, values, iteration)
            except Exception:
                pass


def _scale_schedules_for_batch(config: TrainConfig) -> TrainConfig:
    """Divide iteration-denominated schedules by batch_size (min 1) so the
    per-image cadence matches the single-view reference protocol. Applied
    at trainer init when scale_schedules_with_batch is on; num_iterations
    and val_interval stay user-facing (the user already divides iterations
    when training at equal images seen)."""
    b = int(config.batch_size)
    if b <= 1:
        return config
    lr_mult = {"none": 1.0, "sqrt": float(b) ** 0.5,
               "linear": float(b)}[config.scale_lr_with_batch]
    if not config.scale_schedules_with_batch:
        # cadence scaling off; LR compensation is its own knob
        return dataclasses.replace(
            config,
            feature_learning_rate=config.feature_learning_rate * lr_mult,
            position_learning_rate=config.position_learning_rate * lr_mult)

    def div(x):
        return max(int(x) // b, 1)

    ctrl = dataclasses.replace(
        config.adaptive_controller_config,
        num_iterations_warm_up=div(
            config.adaptive_controller_config.num_iterations_warm_up),
        num_iterations_densify=div(
            config.adaptive_controller_config.num_iterations_densify),
        num_iterations_reset_alpha=div(
            config.adaptive_controller_config.num_iterations_reset_alpha),
        iteration_start_remove_floater=div(
            config.adaptive_controller_config.iteration_start_remove_floater),
    )
    import logging
    logging.getLogger(__name__).info(
        "batch_size=%d: dividing iteration schedules by the batch size "
        "(densify %d, warm-up %d, alpha reset %d, SH unlock %d, downsample "
        "%d, pos-LR decay %d); set scale_schedules_with_batch: false to "
        "keep raw iteration cadences (costs ~2 dB at equal images seen, "
        "see benchmark/README.md batch-parity section)", b,
        ctrl.num_iterations_densify, ctrl.num_iterations_warm_up,
        ctrl.num_iterations_reset_alpha,
        div(config.increase_color_max_sh_band_interval),
        div(config.half_downsample_factor_interval),
        div(config.position_learning_rate_decay_interval))
    return dataclasses.replace(
        config,
        adaptive_controller_config=ctrl,
        increase_color_max_sh_band_interval=div(
            config.increase_color_max_sh_band_interval),
        half_downsample_factor_interval=div(
            config.half_downsample_factor_interval),
        position_learning_rate_decay_interval=div(
            config.position_learning_rate_decay_interval),
        feature_learning_rate=config.feature_learning_rate * lr_mult,
        position_learning_rate=config.position_learning_rate * lr_mult,
    )


class GaussianPointCloudTrainer:
    def __init__(self, config: TrainConfig):
        # normalize defaults on the CALLER's config first (callers read
        # output_model_dir back), then derive the batch-scaled copy
        if config.output_model_dir is None:
            config.output_model_dir = config.summary_writer_log_dir
        config = _scale_schedules_for_batch(config)
        self.config = config
        os.makedirs(config.summary_writer_log_dir, exist_ok=True)
        os.makedirs(config.output_model_dir, exist_ok=True)
        self.logger = MetricsLogger(config.summary_writer_log_dir,
                                    config.print_metrics_to_console)
        self.train_dataset = ImagePoseDataset(config.train_dataset_json_path)
        self.val_dataset = ImagePoseDataset(config.val_dataset_json_path)
        self.scene = GaussianPointCloudScene.from_parquet(
            config.pointcloud_parquet_path,
            config.gaussian_point_cloud_scene_config, seed=config.seed)
        if config.spatial_sort:
            # Morton-order the initial pool: per-tile point-id locality is
            # what the blend-slab gather caches on (models/scene.py
            # spatially_sorted). Checkpoint resume overwrites the scene
            # wholly, preserving its saved order/optimizer alignment.
            self.scene = self.scene.spatially_sorted()
        n = self.scene.capacity
        self.ctrl_state = ControllerState.zeros(n)
        self.loss_fn = LossFunction(config.loss_function_config)
        self.best_psnr_score = 0.0
        self._overflow_strikes = 0
        self._overflow_ignore_until = -1
        self._recovery_tail_suppressed = False
        self._last_flush_iteration = -1
        self.key = jax.random.PRNGKey(config.seed)

        if config.auto_capacity:
            self._apply_auto_capacity()

        feat_lr = config.feature_learning_rate
        pos_base = config.position_learning_rate
        gamma = config.position_learning_rate_decay_rate
        interval = config.position_learning_rate_decay_interval

        def pos_schedule(count):
            # reference steps the scheduler right after the optimizer step on
            # iterations 0, interval, 2*interval, ... (reference: :183-184)
            return pos_base * gamma ** jnp.ceil(count / interval)

        b = max(int(config.batch_size), 1)
        b1, b2 = ((0.9 ** b, 0.999 ** b)
                  if config.scale_betas_with_batch and b > 1 else
                  (0.9, 0.999))
        self.feature_optimizer = optax.adam(feat_lr, b1=b1, b2=b2,
                                            eps=1e-8)
        self.position_optimizer = optax.adam(pos_schedule, b1=b1, b2=b2,
                                             eps=1e-8)
        self.opt_state_features = self.feature_optimizer.init(
            self.scene.point_cloud_features)
        self.opt_state_positions = self.position_optimizer.init(
            self.scene.point_cloud)
        self._step_fns = {}
        self._grad_scale = jnp.asarray(
            _grad_group_scale(config.rasterisation_config))
        self._densify_fn = None
        self._reset_alpha_fn = None
        self._mesh = None
        self._val_cache = None
        self.start_iteration = 0
        if config.resume_from_checkpoint:
            state_template = (self.scene, self.opt_state_features,
                             self.opt_state_positions, self.ctrl_state,
                             self.key)
            (restored, self.start_iteration,
             self.best_psnr_score) = load_checkpoint(
                config.resume_from_checkpoint, state_template)
            (self.scene, self.opt_state_features, self.opt_state_positions,
             self.ctrl_state, self.key) = restored

    def _probe_poses(self, probe_views: int = 0):
        """(views, camera_info) for capacity probing: `probe_views` poses
        sampled evenly across the training dataset."""
        k = max(min(probe_views or self.config.auto_capacity_probe_views,
                    len(self.train_dataset)), 1)
        idxs = np.linspace(0, len(self.train_dataset) - 1, k).astype(int)
        views = []
        cam = None
        for i in idxs:
            item = self.train_dataset[int(i)]
            cam = item.camera_info
            views.append((jnp.asarray(item.q_pointcloud_camera),
                          jnp.asarray(item.t_pointcloud_camera)))
        return views, cam

    def _apply_auto_capacity(self, probe_views: int = 0):
        """Scene-derived binning budgets (reference design gap: its CUDA
        pipeline allocates per frame; our static budgets come from a probe
        of the initial scene over a few dataset poses, see
        ops/capacity.py)."""
        from ..ops.capacity import auto_capacity_config
        config = self.config
        views, cam = self._probe_poses(probe_views)
        config.rasterisation_config = auto_capacity_config(
            self.scene.point_cloud, self.scene.point_cloud_features,
            self.scene.point_invalid_mask, self.scene.point_object_id,
            views, cam, config.rasterisation_config,
            headroom=config.auto_capacity_headroom)
        rc = config.rasterisation_config
        print(f"auto_capacity: max_keys={rc.max_keys} "
              f"pool_slots={rc.pool_slots} pool_caps={rc.pool_caps};",
              flush=True)

    # ------------------------------------------------------------------
    # jitted step construction (one executable per image shape)
    # ------------------------------------------------------------------

    def _get_batch_step_fn(self, camera_info: CameraInfo):
        """Multi-view data-parallel step (batch_size > 1): the full Pallas
        pipeline per view on each chip, gradients psum'd over ICI
        (parallel/sharding.py). One executable per image shape."""
        key = (camera_info.camera_height, camera_info.camera_width, "dp")
        if key in self._step_fns:
            return self._step_fns[key]
        from ..parallel.sharding import (make_data_parallel_train_step,
                                         make_mesh)
        if self._mesh is None:
            self._mesh = make_mesh(self.config.mesh_devices or None)
        step = make_data_parallel_train_step(
            self._mesh, camera_info, self.config.rasterisation_config,
            self.loss_fn, self.feature_optimizer, self.position_optimizer)
        self._step_fns[key] = step
        return step

    def _get_cached_batch_step_fn(self, camera_info: CameraInfo,
                                  num_views: int):
        """Device-cached variant of the data-parallel batch step: batch
        selection, iteration counter, and SH-band curriculum run inside the
        jit (same zero-transfer rationale as _get_cached_step_fn). Views are
        drawn from a device-side epoch permutation; with batch_size >
        num_views indices wrap within the current permutation."""
        key = (camera_info.camera_height, camera_info.camera_width,
               num_views, "dp-cached")
        if key in self._step_fns:
            return self._step_fns[key]
        dp_step = self._get_batch_step_fn(camera_info)
        band_interval = self.config.increase_color_max_sh_band_interval
        batch = self.config.batch_size

        @jax.jit
        def cached_batch_step(scene, opt_feat, opt_pos, ctrl_state,
                              data_state, images, qs, ts, intrs):
            iteration, perm, pos, prng = data_state

            def reshuffle(args):
                perm, prng, pos = args
                prng, sub = jax.random.split(prng)
                return (jax.random.permutation(
                    sub, jnp.arange(num_views, dtype=jnp.int32)),
                    prng, jnp.int32(0))

            perm, prng, pos = jax.lax.cond(
                pos >= num_views, reshuffle, lambda a: a, (perm, prng, pos))
            idxs = perm[(pos + jnp.arange(batch, dtype=jnp.int32))
                        % num_views]
            sh_band = iteration // band_interval
            out = dp_step(scene, opt_feat, opt_pos, ctrl_state,
                          _cache_image_to_float(images[idxs]), qs[idxs],
                          ts[idxs], intrs[idxs], sh_band)
            new_state = (iteration + 1, perm, pos + batch, prng)
            return out + (new_state, idxs[-1])

        self._step_fns[key] = cached_batch_step
        return cached_batch_step

    def _get_step_fn(self, camera_info: CameraInfo):
        key = (camera_info.camera_height, camera_info.camera_width)
        if key in self._step_fns:
            return self._step_fns[key]
        step = jax.jit(self._make_raw_step(camera_info))
        self._step_fns[key] = step
        return step

    def _get_cached_step_fn(self, camera_info: CameraInfo, num_views: int):
        """One-dispatch-per-iteration step over the DEVICE-cached dataset.

        View selection (per-epoch permutation), the iteration counter, and
        the SH-band curriculum all live on device in `data_state`, so the
        host enqueues exactly one execution per iteration with zero
        host->device transfers - through a remote-TPU tunnel each transfer
        or extra dispatch costs tens of milliseconds (measured), which at
        one image per step would dominate the compute.

        data_state = (iteration (), perm (V,), pos (), prng_key); initialize
        pos = V so the first step reshuffles. Signature:
          step(scene, opt_feat, opt_pos, ctrl, data_state,
               images (V,H,W,3), qs (V,1,4), ts (V,1,3), intrs (V,3,3))
        returning the raw step outputs plus the advanced data_state.
        """
        key = (camera_info.camera_height, camera_info.camera_width,
               num_views, "cached")
        if key in self._step_fns:
            return self._step_fns[key]
        raw_step = self._make_raw_step(camera_info)
        band_interval = self.config.increase_color_max_sh_band_interval

        @jax.jit
        def cached_step(scene, opt_feat, opt_pos, ctrl_state, data_state,
                        images, qs, ts, intrs):
            iteration, perm, pos, prng = data_state
            def reshuffle(args):
                perm, prng, pos = args
                prng, sub = jax.random.split(prng)
                return (jax.random.permutation(
                    sub, jnp.arange(num_views, dtype=jnp.int32)),
                    prng, jnp.int32(0))
            perm, prng, pos = jax.lax.cond(
                pos >= num_views, reshuffle, lambda a: a,
                (perm, prng, pos))
            idx = perm[pos]
            sh_band = iteration // band_interval
            out = raw_step(scene, opt_feat, opt_pos, ctrl_state,
                           _cache_image_to_float(images[idx]), qs[idx],
                           ts[idx], sh_band, intrs[idx])
            new_state = (iteration + 1, perm, pos + 1, prng)
            return out + (new_state, idx)

        self._step_fns[key] = cached_step
        return cached_step

    def _make_raw_step(self, camera_info: CameraInfo):
        raster_cfg = self.config.rasterisation_config
        loss_fn = self.loss_fn
        grad_scale = self._grad_scale
        feature_optimizer = self.feature_optimizer
        position_optimizer = self.position_optimizer

        def step(scene: GaussianPointCloudScene, opt_feat, opt_pos,
                 ctrl_state: ControllerState, image_gt, q, t, sh_band,
                 intrinsics):
            cam = dataclasses.replace(camera_info,
                                      camera_intrinsics=intrinsics)
            feats = scene.point_cloud_features
            # quaternion re-normalization (reference side effect, :264);
            # the norm is floored so all-zero padding slots stay 0 instead
            # of becoming 0/0=NaN (see ops/projection.py
            # normalize_straight_through_columns)
            qnorm = feats[:, 0:4] / jnp.maximum(jnp.linalg.norm(
                feats[:, 0:4], axis=1, keepdims=True), 1e-12)
            feats = feats.at[:, 0:4].set(qnorm)
            scene = scene._replace(point_cloud_features=feats)

            # the reference evaluates the full deg-3 SH in forward and gates
            # the curriculum purely through gradient masking (reference:
            # :1167-1182); match that exactly (inactive coeffs stay zero)
            result, vjp_fn = rasterize_with_vjp(
                scene.point_cloud, feats, scene.point_invalid_mask,
                scene.point_object_id, q, t, cam, raster_cfg)

            def image_loss(image, features):
                img = jnp.clip(image, 0.0, 1.0)
                loss, l1, ld_ssim = loss_fn(
                    img, image_gt,
                    point_invalid_mask=scene.point_invalid_mask,
                    pointcloud_features=features)
                return loss, (l1, ld_ssim, img)

            (loss, (l1, ld_ssim, img)), loss_grads = jax.value_and_grad(
                image_loss, argnums=(0, 1), has_aux=True)(result.image, feats)
            g_image, g_feats_direct = loss_grads

            grad_pc, grad_feats_raster, stats = vjp_fn(g_image)
            # per-group scaling + SH band gradient masking on the
            # rasterizer path only (reference: :1102-1125)
            band_mask = feature_sh_band_mask(sh_band)
            grad_feats = grad_feats_raster * grad_scale * band_mask \
                + g_feats_direct

            # ---- numeric containment (training/trainer.py layer of the
            # defense started in ops/projection.py) ----
            # Per-point: a culled degenerate splat's VJP can still emit
            # 0-cotangent x inf-jacobian = NaN rows; zero them so one bad
            # point cannot poison its own Adam moments (it keeps training
            # from its last finite state or gets pruned by the controller).
            feat_row_ok = jnp.all(jnp.isfinite(grad_feats), axis=1,
                                  keepdims=True)
            pc_row_ok = jnp.all(jnp.isfinite(grad_pc), axis=1, keepdims=True)
            nonfinite_grad_rows = jnp.sum(
                (~feat_row_ok[:, 0] | ~pc_row_ok[:, 0]).astype(jnp.int32))
            grad_feats = jnp.where(feat_row_ok, grad_feats, 0.0)
            grad_pc = jnp.where(pc_row_ok, grad_pc, 0.0)
            # Whole-step: a non-finite LOSS means the image itself is
            # poisoned (every gradient with it); applying that update once
            # destroyed a 30k campaign (one NaN loss -> all params NaN ->
            # NaN-pruning ate 131k of 135k points). Skip the update and the
            # controller-statistics accumulation entirely for this step.
            loss_ok = jnp.isfinite(loss)

            updates_f, new_opt_feat = feature_optimizer.update(
                grad_feats, opt_feat, feats)
            new_feats = optax.apply_updates(feats, updates_f)
            updates_p, new_opt_pos = position_optimizer.update(
                grad_pc, opt_pos, scene.point_cloud)
            new_pc = optax.apply_updates(scene.point_cloud, updates_p)

            def _keep_if_ok(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(loss_ok, a, b), new, old)

            new_feats = _keep_if_ok(new_feats, feats)
            new_pc = _keep_if_ok(new_pc, scene.point_cloud)
            opt_feat = _keep_if_ok(new_opt_feat, opt_feat)
            opt_pos = _keep_if_ok(new_opt_pos, opt_pos)

            new_scene = scene._replace(point_cloud=new_pc,
                                       point_cloud_features=new_feats)
            ctrl_state = _keep_if_ok(
                update_stats(ctrl_state, stats, grad_pc,
                             result.aux.in_frustum), ctrl_state)
            metrics = {
                "loss": loss, "l1": l1, "ssim_loss": ld_ssim,
                "psnr": psnr_fn(img, image_gt),
                "ssim": 1.0 - ld_ssim,
                "big_point_overflow": result.aux.big_point_overflow,
                "key_overflow": result.aux.key_overflow,
                "tile_cap_overflow": result.aux.tile_cap_overflow,
                "total_keys": result.aux.total_keys,
                "nonfinite_points": result.aux.nonfinite_points,
                "nonfinite_grad_rows": nonfinite_grad_rows,
                "skipped_nonfinite_step": 1 - loss_ok.astype(jnp.int32),
            }
            densify_inputs = (stats, result.aux.in_frustum,
                              result.aux.point_depth, result.aux.point_uv)
            return (new_scene, opt_feat, opt_pos, ctrl_state, metrics,
                    densify_inputs, result.pixel_valid_point_count,
                    result.depth, img)

        return step

    def _get_densify_fn(self):
        if self._densify_fn is None:
            cfg = self.config.adaptive_controller_config

            @jax.jit
            def densify(scene, ctrl_state, stats, in_frustum, depth,
                        pos_before, iteration, key):
                return densify_step(scene, ctrl_state, stats, in_frustum,
                                    depth, pos_before, iteration, key, cfg)

            self._densify_fn = densify
        return self._densify_fn

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    def _build_device_cache(self, factor: int):
        """Upload the whole (downsampled) training set to HBM once.

        Returns (camera_info, images (V,H,W,3), qs (V,1,4), ts (V,1,3),
        intrinsics (V,3,3)) as device arrays, or None when shapes are mixed
        or the byte budget would be exceeded (streaming fallback)."""
        config = self.config
        n = len(self.train_dataset)
        items = []
        for i in range(n):
            items.append(_downsample_item(self.train_dataset[i], factor))
        shapes = {(it.camera_info.camera_height, it.camera_info.camera_width)
                  for it in items}
        if len(shapes) != 1:
            return None
        total_bytes = sum(it.image.size for it in items)  # uint8 cache
        if total_bytes > config.device_cache_max_bytes:
            return None
        # uint8 on device (see _cache_image_to_float): 4x smaller upload
        # and HBM footprint, lossless for PNG-sourced data
        images = jnp.asarray(np.stack(
            [np.round(np.asarray(it.image, np.float32) * 255.0)
             .astype(np.uint8) for it in items]))
        qs = jnp.asarray(np.stack(
            [np.asarray(it.q_pointcloud_camera, np.float32) for it in items]))
        ts = jnp.asarray(np.stack(
            [np.asarray(it.t_pointcloud_camera, np.float32) for it in items]))
        intrs = jnp.asarray(np.stack(
            [np.asarray(it.camera_info.camera_intrinsics, np.float32)
             for it in items]))
        jax.block_until_ready(images)
        return (items[0].camera_info, images, qs, ts, intrs)

    def train(self):
        config = self.config
        ctrl_cfg = config.adaptive_controller_config
        if jax.devices()[0].platform == "tpu":
            # advisory chip lock: lets other tools (bench.py) distinguish
            # "chip busy with this training job" from "tunnel wedged"
            from ..utils import device_lock
            device_lock.acquire()
        use_cache = config.cache_dataset_on_device
        loader = None
        data_iter = None
        if not use_cache:
            loader = PrefetchLoader(self.train_dataset, shuffle=True,
                                    num_workers=4, seed=config.seed)
            data_iter = iter(loader)
        device_cache = None
        cache_factor = -1
        downsample_factor = config.initial_downsample_factor
        recent_losses = collections.deque(maxlen=100)
        pending_metrics = []
        self._previous_problematic_iteration = -1000
        self._last_containment_warn = -1000

        start = self.start_iteration
        # replay the downsample schedule up to the resume point
        for it in range(0, start):
            if (it % config.half_downsample_factor_interval == 0
                    and it > 0 and downsample_factor > 1):
                downsample_factor //= 2
        try:
            from tqdm import tqdm
            progress = tqdm(range(start, config.num_iterations),
                            initial=start, total=config.num_iterations)
        except ImportError:
            progress = range(start, config.num_iterations)

        profiling = False
        for iteration in progress:
            if config.enable_profiler:
                if iteration == config.profiler_start_iteration:
                    jax.profiler.start_trace(os.path.join(
                        config.summary_writer_log_dir, "profile"))
                    profiling = True
                elif profiling and iteration == (
                        config.profiler_start_iteration
                        + config.profiler_num_steps):
                    jax.block_until_ready(self.scene.point_cloud_features)
                    jax.profiler.stop_trace()
                    profiling = False
            if (iteration % config.half_downsample_factor_interval == 0
                    and iteration > 0 and downsample_factor > 1):
                downsample_factor = downsample_factor // 2
            sh_band = iteration // config.increase_color_max_sh_band_interval
            pos_before = self.scene.point_cloud  # pre-optimizer positions

            # ---- inputs: device cache (one upload per factor) or stream --
            if use_cache and cache_factor != downsample_factor:
                device_cache = self._build_device_cache(downsample_factor)
                cache_factor = downsample_factor
                if device_cache is not None:
                    v = device_cache[1].shape[0]
                    self.key, sub = jax.random.split(self.key)
                    # device-side data state: iteration counter (drives the
                    # SH-band curriculum), epoch permutation (pos=V forces a
                    # shuffle on the first step), PRNG key
                    self._data_state = (jnp.int32(iteration),
                                        jnp.arange(v, dtype=jnp.int32),
                                        jnp.int32(v), sub)
                elif data_iter is None:
                    loader = PrefetchLoader(self.train_dataset, shuffle=True,
                                            num_workers=4, seed=config.seed)
                    data_iter = iter(loader)

            if config.batch_size > 1:
                if device_cache is not None:
                    cam, images_d, qs_d, ts_d, intrs_d = device_cache
                    step = self._get_cached_batch_step_fn(
                        cam, images_d.shape[0])
                    (self.scene, self.opt_state_features,
                     self.opt_state_positions, self.ctrl_state, metrics,
                     densify_inputs, last_maps, self._data_state,
                     last_idx) = step(
                        self.scene, self.opt_state_features,
                        self.opt_state_positions, self.ctrl_state,
                        self._data_state, images_d, qs_d, ts_d, intrs_d)
                    pred_image, depth_map, valid_count_map = last_maps
                    gt_image_host = _LazyCacheImage(images_d, last_idx)
                else:
                    items = [_downsample_item(next(data_iter),
                                              downsample_factor)
                             for _ in range(config.batch_size)]
                    cam = items[-1].camera_info
                    for other in items[:-1]:
                        if (other.camera_info.camera_height
                                != cam.camera_height
                                or other.camera_info.camera_width
                                != cam.camera_width):
                            raise ValueError(
                                "batch_size > 1 requires a uniform image "
                                "shape (one executable per shape)")
                    batch_in = (
                        jnp.stack([jnp.asarray(i.image) for i in items]),
                        jnp.stack([jnp.asarray(i.q_pointcloud_camera)
                                   for i in items]),
                        jnp.stack([jnp.asarray(i.t_pointcloud_camera)
                                   for i in items]),
                        jnp.stack([jnp.asarray(
                            i.camera_info.camera_intrinsics, jnp.float32)
                            for i in items]))
                    step = self._get_batch_step_fn(cam)
                    (self.scene, self.opt_state_features,
                     self.opt_state_positions, self.ctrl_state, metrics,
                     densify_inputs, last_maps) = step(
                        self.scene, self.opt_state_features,
                        self.opt_state_positions, self.ctrl_state,
                        *batch_in, jnp.int32(sh_band))
                    pred_image, depth_map, valid_count_map = last_maps
                    gt_image_host = items[-1].image
            elif device_cache is not None:
                # ONE dispatch, ZERO transfers per iteration: view choice,
                # iteration counter, and SH-band curriculum run on device
                cam, images_d, qs_d, ts_d, intrs_d = device_cache
                step = self._get_cached_step_fn(cam, images_d.shape[0])
                (self.scene, self.opt_state_features,
                 self.opt_state_positions, self.ctrl_state, metrics,
                 densify_inputs, valid_count_map, depth_map, pred_image,
                 self._data_state, last_idx) = step(
                    self.scene, self.opt_state_features,
                    self.opt_state_positions, self.ctrl_state,
                    self._data_state, images_d, qs_d, ts_d, intrs_d)
                gt_image_host = _LazyCacheImage(images_d, last_idx)
            else:
                item = next(data_iter)
                item = _downsample_item(item, downsample_factor)
                cam = item.camera_info
                step = self._get_step_fn(cam)
                (self.scene, self.opt_state_features,
                 self.opt_state_positions, self.ctrl_state, metrics,
                 densify_inputs, valid_count_map, depth_map,
                 pred_image) = step(
                    self.scene, self.opt_state_features,
                    self.opt_state_positions, self.ctrl_state,
                    jnp.asarray(item.image),
                    jnp.asarray(item.q_pointcloud_camera),
                    jnp.asarray(item.t_pointcloud_camera),
                    jnp.int32(sh_band),
                    jnp.asarray(cam.camera_intrinsics, jnp.float32))
                gt_image_host = item.image

            # ---- adaptive controller cadence (reference: :142-167) ----
            densified = False
            if (iteration >= ctrl_cfg.num_iterations_warm_up
                    and iteration % ctrl_cfg.num_iterations_densify == 0):
                stats, in_frustum, depth_pts, point_uv = densify_inputs
                self.key, subkey = jax.random.split(self.key)
                self.scene, self.ctrl_state, counts = self._get_densify_fn()(
                    self.scene, self.ctrl_state, stats, in_frustum,
                    depth_pts, pos_before, jnp.int32(iteration), subkey)
                densified = True
                self._log_histograms(iteration, stats)
                if (self.logger.tb is not None
                        and iteration % ctrl_cfg.plot_densify_interval == 0):
                    self._log_densify_scatter(iteration, point_uv, counts,
                                              cam)
                self.logger.scalars(iteration, {
                    "densify/num_transparent": counts.num_transparent,
                    "densify/num_floaters": counts.num_floaters,
                    "densify/num_candidates": counts.num_candidates,
                    "densify/num_fillable": counts.num_fillable,
                    "densify/num_over_reconstructed":
                        counts.num_over_reconstructed,
                    "value/num_valid_points": counts.num_valid_after,
                })
            if (iteration >= ctrl_cfg.num_iterations_warm_up
                    and iteration % ctrl_cfg.num_iterations_reset_alpha == 0):
                self.scene = reset_alpha(self.scene, ctrl_cfg)

            # ---- deferred metrics pipeline (reference: :205-264) ----
            # Materializing a device scalar blocks on the step AND pays a
            # host round trip (measured ~200 ms through the axon TPU
            # tunnel, vs an ~8-50 ms device step). Metrics therefore stay
            # on device and are fetched in ONE batched device_get per
            # log_loss_interval. The loss-spike detector and the capacity
            # overflow guard run on the flushed batch - at most
            # log_loss_interval iterations late (the reference pays a
            # per-iteration sync instead, reference: :233-238).
            now = time.perf_counter()
            if not hasattr(self, "_last_iter_time"):
                self._last_iter_time = now
            iter_wall = now - self._last_iter_time
            self._last_iter_time = now
            pending_metrics.append((iteration, metrics, iter_wall))
            validation_due = ((iteration % config.val_interval == 0
                               and iteration != 0)
                              or iteration in (5000, 7000))  # reference: :266
            # the final iteration only forces a flush (the post-loop
            # validation covers it)
            flush_due = (validation_due
                         or iteration == config.num_iterations - 1)
            is_problematic = False
            if iteration % config.log_loss_interval == 0 or flush_due:
                is_problematic = self._flush_metrics(pending_metrics,
                                                     recent_losses)
                pending_metrics.clear()

            if ((iteration % config.log_image_interval == 0 or is_problematic)
                    and pred_image is not None):
                # [pred | gt | depth cmap | points-per-pixel] panel
                # (reference: GaussianPointTrainer.py:240-263); on a spike
                # the panel shows the current step, which is at most
                # log_loss_interval iterations after the flagged one
                from ..utils.visualization import (easy_cmap, make_image_grid,
                                                   normalized_gray)
                tag = ("train/image_problematic" if is_problematic
                       else "train/image")
                gt_np = (gt_image_host.fetch()
                         if isinstance(gt_image_host, _LazyCacheImage)
                         else np.asarray(gt_image_host))
                panel = make_image_grid([
                    np.asarray(pred_image), gt_np,
                    easy_cmap(np.asarray(depth_map)),
                    normalized_gray(np.asarray(valid_count_map)),
                    np.abs(np.asarray(pred_image) - gt_np),
                ], nrow=2)
                self.logger.image(iteration, tag, panel)

            if validation_due:
                self.validation(iteration)
                self._probe_ahead_capacity(iteration)

        self.validation(config.num_iterations,
                        completed=config.num_iterations)

    def _flush_metrics(self, pending, recent_losses) -> bool:
        """Materialize queued per-iteration metrics with ONE device_get and
        run the per-iteration bookkeeping on them (loss-spike detection,
        overflow guard, cadenced logging). Returns whether any flushed
        iteration tripped the loss-spike detector (reference: :233-238)."""
        config = self.config
        if not pending:
            return False
        # everything up to the newest pending iteration was dispatched with
        # the CURRENT step functions (the loop flushes synchronously)
        self._last_flush_iteration = pending[-1][0]
        fetched = jax.device_get([m for _, m, _ in pending])
        any_problematic = False
        # the host runs ahead of the device (async dispatch), so a single
        # iteration's host-side delta is meaningless: report the batch mean,
        # which is the true amortized wall seconds per iteration
        mean_wall = sum(w for _, _, w in pending) / len(pending)
        for (iteration, _, iter_wall), vals in zip(pending, fetched):
            vals = {k: float(v) for k, v in vals.items()}
            loss_value = vals["loss"]
            recent_losses.append(loss_value)
            if (len(recent_losses) == recent_losses.maxlen
                    and iteration - self._previous_problematic_iteration
                    > recent_losses.maxlen):
                avg_loss = sum(recent_losses) / len(recent_losses)
                if loss_value > avg_loss * 1.5:
                    any_problematic = True
                    self._previous_problematic_iteration = iteration
            # numeric-containment telemetry (the in-jit guards already
            # culled / zeroed / skipped). Severity split: a SKIPPED step or
            # a non-finite loss is a real failure - always loud, always a
            # problematic-image panel (the 1.5x spike detector above never
            # trips on NaN since NaN comparisons are False). Culled points /
            # zeroed gradient rows with a finite loss mean the containment
            # ABSORBED the event and the step proceeded; late in a long run
            # a small population of degenerate splats makes that chronic
            # (~0.1% of rows every iteration in the round-4 30k campaign),
            # and treating it as problematic forced a 5-image debug panel
            # fetch every flush - thousands of tunnel round-trips. Benign
            # containment therefore logs scalars every time but prints at
            # a 100-iteration cadence and never forces panels.
            nonfin = (vals.get("nonfinite_points", 0.0)
                      + vals.get("nonfinite_grad_rows", 0.0)
                      + vals.get("skipped_nonfinite_step", 0.0))
            severe = (vals.get("skipped_nonfinite_step", 0.0) > 0
                      or not math.isfinite(loss_value))
            if nonfin > 0 or severe:
                if severe:
                    any_problematic = True
                    self._previous_problematic_iteration = iteration
                if severe or (iteration - self._last_containment_warn
                              >= 100):
                    self._last_containment_warn = iteration
                    print(f"WARNING: numeric containment at iteration "
                          f"{iteration}: culled_points="
                          f"{vals.get('nonfinite_points', 0.0):.0f} "
                          f"zeroed_grad_rows="
                          f"{vals.get('nonfinite_grad_rows', 0.0):.0f} "
                          f"skipped_step="
                          f"{vals.get('skipped_nonfinite_step', 0.0):.0f} "
                          f"loss={loss_value}", flush=True)
                self.logger.scalars(iteration, {
                    "train/nonfinite_points":
                        vals.get("nonfinite_points", 0.0),
                    "train/nonfinite_grad_rows":
                        vals.get("nonfinite_grad_rows", 0.0),
                    "train/skipped_nonfinite_step":
                        vals.get("skipped_nonfinite_step", 0.0)})
            if iteration % config.overflow_check_interval == 0:
                self._check_capacity_overflow(iteration, vals)
            if iteration % config.log_loss_interval == 0:
                self.logger.scalars(iteration, {
                    "train/iter_wall_seconds": mean_wall,
                    "train/loss": vals["loss"],
                    "train/l1 loss": vals["l1"],
                    "train/ssim loss": vals["ssim_loss"],
                    "train/big_point_overflow": vals["big_point_overflow"],
                    "train/tile_cap_overflow": vals["tile_cap_overflow"],
                    "train/total_keys": vals["total_keys"],
                }, console_keys=(
                    ("train/loss", "train/l1 loss", "train/ssim loss")
                    if config.print_metrics_to_console else ()))
                if config.print_metrics_to_console:
                    print(f"train_iteration={iteration};")
            if iteration % config.log_metrics_interval == 0:
                self.logger.scalars(iteration, {
                    "train/psnr": vals["psnr"], "train/ssim": vals["ssim"]})
                if config.print_metrics_to_console:
                    print(f"train_psnr={vals['psnr']};")
                    print(f"train_psnr_{iteration}={vals['psnr']};")
                    print(f"train_ssim={vals['ssim']};")
                    print(f"train_ssim_{iteration}={vals['ssim']};")
        return any_problematic

    def _check_capacity_overflow(self, iteration: int, metrics: dict):
        """Continuous capacity-overflow guard.

        The fixed tier budgets (ops/tiling.py) drop work by design when a
        scene outgrows them - counted, never silent. Densification can push
        a scene past the budgets mid-training, so this check runs at a
        cadence (not once): every occurrence warns with the exact counters,
        and `fail_on_capacity_overflow` escalates to a hard error after
        three consecutive bad checks instead of silently degrading for the
        remaining iterations.
        """
        if iteration <= self._overflow_ignore_until:
            # counters measured before the last recovery's rebuilt step
            # took effect (the deferred-metrics flush runs up to
            # log_loss_interval iterations behind dispatch) - acting on
            # them would recompile again for nothing (observed on the
            # round-4 campaign: a no-op recovery 60 iterations after the
            # real one, fed entirely by stale pre-rebuild counters)
            return
        ovf = float(metrics["big_point_overflow"])
        kovf = float(metrics.get("key_overflow", 0.0))
        tovf = float(metrics["tile_cap_overflow"])
        keys = max(float(metrics["total_keys"]), 1.0)
        bad = ovf > 0 or kovf > 0 or tovf > 0.05 * keys
        if bad:
            self._overflow_strikes += 1
            msg = (f"tile-binning capacity overflow at iteration {iteration} "
                   f"(big_point_overflow={ovf:.0f}, key_overflow={kovf:.0f}, "
                   f"tile_cap_overflow={tovf:.0f}, keys={keys:.0f}); "
                   f"set auto_capacity: true (or raise max_keys / widen the "
                   f"pool ladder) in the rasterisation config")
            print(f"WARNING: {msg}")
            self.logger.scalars(iteration, {
                "train/overflow_strikes": self._overflow_strikes})
            if self._overflow_strikes >= 3:
                # explicit fail-fast wins over self-healing (CI gates want
                # a hard error, not a recompile)
                if self.config.fail_on_capacity_overflow:
                    raise RuntimeError(
                        f"capacity overflow persisted for "
                        f"{self._overflow_strikes} consecutive checks: {msg}")
                if self.config.capacity_recovery:
                    tail = int(self.config.num_iterations
                               * self.config.recovery_tail_fraction)
                    if iteration >= self.config.num_iterations - tail:
                        if not self._recovery_tail_suppressed:
                            self._recovery_tail_suppressed = True
                            print(
                                f"capacity recovery SUPPRESSED at iteration "
                                f"{iteration}: within the final {tail} "
                                f"iterations a recompile costs more than the "
                                f"counted overflow it would recover "
                                f"(big={ovf:.0f} key={kovf:.0f} "
                                f"tile={tovf:.0f} of {keys:.0f} keys); "
                                f"overflow stays counted in the metrics",
                                flush=True)
                    else:
                        self._recover_capacity(iteration, ovf, kovf,
                                               tovf > 0.05 * keys)
        else:
            self._overflow_strikes = 0

    def _merge_budgets(self, probed_rc, old_rc):
        """Monotonic budget merge: probed budgets never shrink what training
        already used (a pose-dependent probe dip must not churn recompiles).
        Merges against the old config's RESOLVED ladder: a legacy config
        (empty pool_slots) still binned through real divisor-derived tiers
        (resolve_pools), and merging against the raw empty tuples would let
        a small probed ladder silently SHRINK effective capacity below what
        training already used (observed: a toy e2e run's loss rose after
        recovery replaced the legacy tiers with a tighter ladder)."""
        from ..ops.tiling import resolve_pools
        merged = dict(zip(probed_rc.pool_slots, probed_rc.pool_caps))
        old_pools = resolve_pools(
            self.scene.capacity, 1 << 30, old_rc.max_tiles_per_point,
            old_rc.big_point_divisor, old_rc.mid_point_divisor,
            old_rc.max_tiles_per_huge_point, old_rc.huge_pool_size,
            old_rc.pool_slots, old_rc.pool_caps)
        for s, c in old_pools:
            merged[s] = max(merged.get(s, 0), c)
        slots = tuple(sorted(merged))
        # tier-A cap merge: 0 means the UNCAPPED dense layout, which must
        # win over any finite probe (monotonicity: never shrink capacity)
        if old_rc.tier_a_cap == 0 or probed_rc.tier_a_cap == 0:
            tier_a_cap = 0
        else:
            tier_a_cap = max(probed_rc.tier_a_cap, old_rc.tier_a_cap)
        return dataclasses.replace(
            probed_rc, max_keys=max(probed_rc.max_keys, old_rc.max_keys),
            pool_slots=slots, pool_caps=tuple(merged[s] for s in slots),
            tier_a_cap=tier_a_cap)

    def _probe_ahead_capacity(self, iteration: int):
        """Probe-ahead capacity growth (runs at validation boundaries):
        re-probe the CURRENT scene at the probe-ahead margin; if any budget
        would grow, run a full recovery NOW so the recompile lands at the
        validation boundary (overlapping eval I/O) instead of mid-stepping
        when the overflow guard finally catches dropped work. The round-4
        campaign's recovery #8 fired at iteration 28730 - 96% through the
        run - because growth was purely reactive."""
        config = self.config
        if not (config.auto_capacity and config.capacity_recovery
                and config.capacity_probe_ahead):
            return
        if iteration >= config.num_iterations - 1:
            return
        from ..ops.capacity import auto_capacity_config
        rc = config.rasterisation_config
        views, cam = self._probe_poses()
        probed = auto_capacity_config(
            self.scene.point_cloud, self.scene.point_cloud_features,
            self.scene.point_invalid_mask, self.scene.point_object_id,
            views, cam, rc, headroom=config.capacity_probe_ahead_margin)
        merged = self._merge_budgets(probed, rc)
        if (merged.max_keys == rc.max_keys
                and merged.pool_slots == rc.pool_slots
                and merged.pool_caps == rc.pool_caps):
            return
        print(f"probe-ahead at iteration {iteration}: current workload "
              f"within {config.capacity_probe_ahead_margin}x of budgets "
              f"(probe wants max_keys {merged.max_keys} vs {rc.max_keys}, "
              f"pools {merged.pool_slots}/{merged.pool_caps}); growing now",
              flush=True)
        self._recover_capacity(iteration)

    def _recover_capacity(self, iteration: int, big_ovf: float = 0.0,
                          key_ovf: float = 0.0, tile_ovf: bool = False):
        """Self-healing capacity: the scene outgrew its binning budgets
        (densification added points/size the init-time probe never saw), so
        re-probe the CURRENT scene and rebuild the jitted steps. Budgets only
        grow (monotonic merge with the previous ladder) - a pose-dependent
        probe dip must not shrink them back and churn recompiles. The
        reference never needs this: its CUDA pipeline allocates per frame
        (reference: GaussianPointCloudRasterisation.py:927-931)."""
        old = self.config.rasterisation_config
        # re-probe self.scene as it is NOW, over more poses than the init
        # probe: mid-run overflow is usually pose-dependent (the round-4
        # campaign overflowed on frames the 4-view probe never saw)
        self._apply_auto_capacity(probe_views=max(
            self.config.auto_capacity_probe_views, 16))
        rc = self._merge_budgets(self.config.rasterisation_config, old)
        if (rc.max_keys == old.max_keys and rc.pool_slots == old.pool_slots
                and rc.pool_caps == old.pool_caps):
            # the probe poses never see the overflowing frames (it samples
            # a few dataset views), yet the counters prove work IS being
            # dropped - force growth along the dimension that overflowed
            # or recovery would recompile an identical program forever
            rc = _escalate_budgets(rc, big_ovf, key_ovf, tile_ovf,
                                   self.scene.capacity)
        self.config.rasterisation_config = rc
        print(f"capacity recovery at iteration {iteration}: rebuilt budgets "
              f"from the densified scene (max_keys {old.max_keys}->"
              f"{rc.max_keys}, pools {old.pool_slots}/{old.pool_caps} -> "
              f"{rc.pool_slots}/{rc.pool_caps}); recompiling step functions",
              flush=True)
        self.logger.scalars(iteration, {
            "train/capacity_recovery_max_keys": rc.max_keys})
        self._step_fns.clear()  # raw steps close over the old config
        self._grad_scale = jnp.asarray(_grad_group_scale(rc))
        self._overflow_strikes = 0
        # counters for iterations dispatched before this rebuild are stale;
        # the deferred flush is at most one log_loss_interval behind
        self._overflow_ignore_until = self._last_flush_iteration

    def _log_densify_scatter(self, iteration: int, point_uv, counts, cam):
        """Floater / over- / under-reconstructed scatter in image space at
        `plot_densify_interval` cadence (reference:
        GaussianPointAdaptiveController.py:267-283)."""
        from ..utils.visualization import densify_scatter_figure
        img = densify_scatter_figure(
            np.asarray(point_uv),
            np.asarray(counts.floater_mask),
            np.asarray(counts.over_reconstructed_mask),
            np.asarray(counts.under_reconstructed_mask),
            cam.camera_height, cam.camera_width)
        if img is not None:
            self.logger.image(iteration, "densify/scatter", img)

    def _log_histograms(self, iteration: int, stats):
        """Gradient-group and value-group histograms at densify cadence
        (reference: GaussianPointTrainer.py:288-332)."""
        if self.logger.tb is None:
            return
        feats = np.asarray(self.scene.point_cloud_features)
        valid = np.asarray(self.scene.point_invalid_mask) == 0
        fv = feats[valid]
        self.logger.histogram(iteration, "value/q", fv[:, 0:4])
        self.logger.histogram(iteration, "value/s", fv[:, 4:7])
        self.logger.histogram(iteration, "value/alpha", fv[:, 7])
        self.logger.histogram(iteration, "value/sigmoid_alpha",
                              1.0 / (1.0 + np.exp(-fv[:, 7])))
        self.logger.histogram(iteration, "value/r", fv[:, 8:24])
        self.logger.histogram(iteration, "value/g", fv[:, 24:40])
        self.logger.histogram(iteration, "value/b", fv[:, 40:56])
        self.logger.histogram(iteration, "grad/uv_grad",
                              np.asarray(stats.grad_viewspace))
        self.logger.histogram(iteration, "grad/uv_grad_magnitude",
                              np.asarray(stats.magnitude_grad_viewspace))
        self.logger.histogram(iteration, "value/num_affected_pixels",
                              np.asarray(stats.num_affected_pixels))

    # ------------------------------------------------------------------
    # validation (reference: :334-415)
    # ------------------------------------------------------------------

    def _render_for_eval(self, item: DatasetItem):
        cam = item.camera_info
        raster_cfg = self.config.rasterisation_config
        result = _eval_render(
            self.scene, jnp.asarray(item.q_pointcloud_camera),
            jnp.asarray(item.t_pointcloud_camera),
            jnp.asarray(cam.camera_intrinsics, jnp.float32),
            CameraInfoStatic(cam.camera_height, cam.camera_width),
            raster_cfg)
        return result

    def _get_val_cache(self):
        """Device-resident validation set (same rationale as the training
        cache: per-view uploads and per-metric syncs through a remote-TPU
        tunnel would cost ~1 s per view). False = streaming fallback."""
        if self._val_cache is None:
            n = len(self.val_dataset)
            items = [self.val_dataset[i] for i in range(n)]
            shapes = {(it.camera_info.camera_height,
                       it.camera_info.camera_width) for it in items}
            total = sum(it.image.size for it in items)  # uint8 cache
            if (n == 0 or len(shapes) != 1
                    or total > self.config.device_cache_max_bytes):
                self._val_cache = False
            else:
                self._val_cache = (
                    items[0].camera_info,
                    jnp.asarray(np.stack(
                        [np.round(np.asarray(it.image, np.float32) * 255.0)
                         .astype(np.uint8) for it in items])),
                    jnp.asarray(np.stack(
                        [np.asarray(it.q_pointcloud_camera, np.float32)
                         for it in items])),
                    jnp.asarray(np.stack(
                        [np.asarray(it.t_pointcloud_camera, np.float32)
                         for it in items])),
                    jnp.asarray(np.stack(
                        [np.asarray(it.camera_info.camera_intrinsics,
                                    np.float32) for it in items])))
        return self._val_cache

    def validation(self, iteration: int, completed: Optional[int] = None):
        config = self.config
        if completed is None:
            completed = iteration + 1  # called after finishing `iteration`
        total_loss = total_psnr = total_ssim = 0.0
        total_time = 0.0
        count = 0
        cache = (self._get_val_cache()
                 if config.cache_dataset_on_device else False)
        fetch_images = config.log_validation_image and self.logger.tb
        if cache:
            # device-cached path: all per-view metrics stay on device and
            # come back in ONE batched fetch
            cam, images_d, qs_d, ts_d, intrs_d = cache
            cam_hw = CameraInfoStatic(cam.camera_height, cam.camera_width)
            raster_cfg = self.config.rasterisation_config
            per_view = []
            imgs = []
            t0 = time.perf_counter()
            for idx in range(images_d.shape[0]):
                img = _eval_render(self.scene, qs_d[idx], ts_d[idx],
                                   intrs_d[idx], cam_hw, raster_cfg)
                img = jnp.clip(img, 0.0, 1.0)
                gt = _cache_image_to_float(images_d[idx])
                loss, _, ld_ssim = self.loss_fn(img, gt)
                per_view.append((loss, psnr_fn(img, gt), ld_ssim))
                if fetch_images:
                    imgs.append(img)
            fetched = jax.device_get(per_view)
            total_time = (time.perf_counter() - t0) * 1000.0
            count = len(fetched)
            for idx, (loss, psnr_v, ld_ssim) in enumerate(fetched):
                total_loss += float(loss)
                total_psnr += float(psnr_v)
                total_ssim += float(1.0 - ld_ssim)
                if fetch_images:
                    grid = np.concatenate(
                        [np.asarray(imgs[idx]),
                         np.asarray(_cache_image_to_float(images_d[idx]))],
                        axis=1)
                    self.logger.image(iteration, f"val/image {idx}", grid)
        else:
            for idx in range(len(self.val_dataset)):
                item = self.val_dataset[idx]
                cam = item.camera_info
                t0 = time.perf_counter()
                image = self._render_for_eval(item)
                image.block_until_ready()
                total_time += (time.perf_counter() - t0) * 1000.0
                img = jnp.clip(image, 0.0, 1.0)
                gt = jnp.asarray(item.image)
                loss, _, ld_ssim = self.loss_fn(img, gt)
                total_loss += float(loss)
                total_psnr += float(psnr_fn(img, gt))
                total_ssim += float(1.0 - ld_ssim)
                count += 1
                if config.log_validation_image:
                    grid = np.concatenate([np.asarray(img), np.asarray(gt)],
                                          axis=1)
                    self.logger.image(iteration, f"val/image {idx}", grid)
        if count == 0:
            return
        mean_loss = total_loss / count
        mean_psnr = total_psnr / count
        mean_ssim = total_ssim / count
        mean_time = total_time / count
        self.logger.scalars(iteration, {
            "val/loss": mean_loss, "val/psnr": mean_psnr,
            "val/ssim": mean_ssim, "val/inference_time": mean_time,
        })  # cached path: inference_time is the per-view mean incl. the
        #     single batched metric fetch
        if config.print_metrics_to_console:
            print(f"val_loss={mean_loss};")
            print(f"val_psnr={mean_psnr};")
            print(f"val_psnr_{iteration}={mean_psnr};")
            print(f"val_ssim={mean_ssim};")
            print(f"val_ssim_{iteration}={mean_ssim};")
            print(f"val_inference_time={mean_time};")
        self.scene.to_parquet(os.path.join(
            config.output_model_dir, f"scene_{iteration}.parquet"))
        if mean_psnr > self.best_psnr_score:
            self.best_psnr_score = mean_psnr
            self.scene.to_parquet(os.path.join(
                config.output_model_dir, "best_scene.parquet"))
        if config.save_full_checkpoint:
            save_checkpoint(
                os.path.join(config.output_model_dir, "train_state.npz"),
                (self.scene, self.opt_state_features,
                 self.opt_state_positions, self.ctrl_state, self.key),
                completed, self.best_psnr_score)


class CameraInfoStatic(tuple):
    """Hashable (height, width) pair used as a static jit argument."""
    def __new__(cls, h, w):
        return super().__new__(cls, (h, w))

    @property
    def camera_height(self):
        return self[0]

    @property
    def camera_width(self):
        return self[1]


@partial(jax.jit, static_argnames=("cam_hw", "raster_cfg"))
def _eval_render(scene, q, t, intrinsics, cam_hw, raster_cfg):
    cam = CameraInfo(camera_intrinsics=intrinsics,
                     camera_height=cam_hw.camera_height,
                     camera_width=cam_hw.camera_width)
    result = rasterize(scene.point_cloud, scene.point_cloud_features,
                       scene.point_invalid_mask, scene.point_object_id,
                       q, t, cam, raster_cfg)
    return result.image
