"""Held-out quality benchmark: full training with densification on a
synthetic multi-view scene at TPU scale.

The reference proves quality on Tanks&Temples Truck (val PSNR 25.21 @ 30k
iterations, reference: README.md:66), but that dataset cannot be shipped
here. Two modes, both with the FULL controller active (floater removal,
alpha reset, densify/split/clone/transparent pruning - the subsystems every
real reference run exercises, reference:
GaussianPointAdaptiveController.py:166-167,194-202,355-358):

- quick (default): in-model gaussian ground truth, 128x128, 48 views, 2000
  iterations - a fast recovery sanity bar (~minutes on one chip).
- --full: the reference-scale campaign. OUT-OF-MODEL procedural ground
  truth (textured surfaces + occlusion + gradient sky, see
  procedural_scene.py), 976x544, 48 views with every 8th strictly held out,
  ~30k-point COLMAP-like init into a >=150k-point pool with a background
  sphere, 30k iterations following the reference Truck protocol shape
  (config/tat_truck_every_8_test.yaml: warm-up 1000, densify 100, alpha
  reset 4000 @ -1.9, floater removal from 2000, SH band unlock 1000,
  coarse-to-fine from 4x). Reports the held-out PSNR/SSIM trajectory AND
  the measured end-to-end wall-clock.

Run on the TPU:  python benchmark/quality_benchmark.py [--full]
Options via env (quick mode): QB_RES (128), QB_VIEWS (48), QB_ITERS (2000),
QB_OUT (logs dir). Full mode: QB_FULL_ITERS (30000), QB_FULL_VIEWS (48),
QB_FULL_POINTS (30000), QB_FULL_RATIO (6.0), QB_OUT.

Prints one JSON line: {"metric": ..., "value": <final holdout PSNR>, ...}
and the full PSNR trajectory.

Quality bars (recorded in benchmark/README.md):
- quick: held-out PSNR >= 25 (reference-VERDICT bar; measured ~31).
- full: held-out PSNR >= 25 at 30k - the reference's Truck bar transplanted
  to a synthetic scene of comparable protocol shape. Out-of-model GT means
  PSNR is bounded by model capacity, like real photos.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_scene(n_points, rng):
    """Quick-mode ground truth: points on two concentric shells plus a core
    cluster - coherent geometry (unlike uniform noise) so novel views are
    honestly predictable from the training orbit."""
    n_shell = n_points // 2
    n_shell2 = n_points // 4
    n_core = n_points - n_shell - n_shell2
    def shell(n, r):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return v * r * rng.uniform(0.9, 1.1, (n, 1))
    pc = np.concatenate([
        shell(n_shell, 0.6), shell(n_shell2, 0.35),
        rng.normal(scale=0.12, size=(n_core, 3)),
    ]).astype(np.float32)
    feats = np.zeros((pc.shape[0], 56), np.float32)
    q = rng.normal(size=(pc.shape[0], 4))
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.4, -2.4, (pc.shape[0], 3))
    feats[:, 7] = rng.uniform(1.0, 4.0, pc.shape[0])
    for ch in (8, 24, 40):
        feats[:, ch] = rng.normal(size=pc.shape[0]) * 1.2
        feats[:, ch + 1:ch + 4] = rng.normal(size=(pc.shape[0], 3)) * 0.35
    return pc, feats


def _write_dataset(records, out_dir, holdout_every=8):
    """Every `holdout_every`-th view strictly held out (reference CI
    protocol, reference: tools/prepare_colmap.py:304-312)."""
    val_records = records[::holdout_every]
    train_records = [r for i, r in enumerate(records)
                     if i % holdout_every != 0]
    with open(os.path.join(out_dir, "train.json"), "w") as f:
        json.dump(train_records, f)
    with open(os.path.join(out_dir, "val.json"), "w") as f:
        json.dump(val_records, f)
    return len(train_records), len(val_records)


def _summarize(out_dir, meta):
    traj = []
    npts = -1
    recoveries = 0
    nonfinite_grad_rows = 0.0
    nonfinite_points = 0.0
    skipped_steps = 0.0
    with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "val/psnr" in rec:
                traj.append((rec["iteration"], round(rec["val/psnr"], 2),
                             round(rec.get("val/ssim", 0.0), 4)))
            if "value/num_valid_points" in rec:
                npts = rec["value/num_valid_points"]
            if "train/capacity_recovery_max_keys" in rec:
                recoveries += 1
            # containment telemetry is logged as windowed means; scale by
            # the window to recover (approximate) event totals
            if "train/nonfinite_grad_rows" in rec:
                nonfinite_grad_rows += rec["train/nonfinite_grad_rows"]
                nonfinite_points += rec.get("train/nonfinite_points", 0.0)
                skipped_steps += rec.get("train/skipped_nonfinite_step", 0.0)
    if npts < 0:
        # densify never logged (short run / warm-up): count the final scene
        try:
            import glob
            import pandas as pd
            scenes = sorted(glob.glob(os.path.join(out_dir, "logs",
                                                   "scene_*.parquet")),
                            key=os.path.getmtime)
            npts = len(pd.read_parquet(scenes[-1]))
        except Exception:
            pass
    best = max(t[1] for t in traj)
    final = traj[-1]
    meta.update({
        "value": final[1], "best": best, "final_ssim": final[2],
        "points": npts, "trajectory": traj,
        "capacity_recoveries": recoveries,
        # windowed-mean sums (see loop above): 0.0 means zero events
        "nonfinite_grad_rows_mean_sum": round(nonfinite_grad_rows, 3),
        "nonfinite_points_mean_sum": round(nonfinite_points, 3),
        "skipped_nonfinite_steps_mean_sum": round(skipped_steps, 3),
    })
    print(json.dumps(meta), flush=True)
    return meta


def main_quick():
    res = int(os.environ.get("QB_RES", "128"))
    n_views = int(os.environ.get("QB_VIEWS", "48"))
    iters = int(os.environ.get("QB_ITERS", "2000"))
    # QB_BATCH > 1 trains batch_size views per optimizer step, sharded over
    # QB_MESH devices (the virtual CPU mesh in benchmark/batch_parity.py;
    # ICI on real multi-chip). Gradients are SUMMED over the batch
    # (parallel/sharding.py convention).
    batch = int(os.environ.get("QB_BATCH", "1"))
    mesh = int(os.environ.get("QB_MESH", "0"))
    out_dir = os.environ.get("QB_OUT", "/tmp/quality_benchmark")
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import PIL.Image
    from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig, rasterize)
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
        SE3_to_quaternion_and_translation)
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)

    H = W = res
    F = res * 0.95
    rng = np.random.default_rng(0)
    pc, feats = make_scene(600, rng)
    n_points = pc.shape[0]
    intr = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
    cam = CameraInfo(camera_intrinsics=intr, camera_height=H, camera_width=W)
    cfg = RasterizerConfig(near_plane=0.3, far_plane=50.0,
                           max_tiles_per_point=32, big_point_divisor=4,
                           mid_point_divisor=2)

    def orbit_pose(angle, elev):
        radius = 2.5
        eye = np.array([radius * np.cos(elev) * np.sin(angle),
                        radius * np.sin(elev),
                        -radius * np.cos(elev) * np.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, forward, eye
        return T

    records = []
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    @jax.jit
    def render_gt(q, t):
        return rasterize(
            jnp.array(pc), jnp.array(feats),
            jnp.zeros((n_points,), jnp.int8),
            jnp.zeros((n_points,), jnp.int32), q, t, cam, cfg).image

    for vi in range(n_views):
        # two interleaved elevation rings for better coverage
        elev = 0.25 if vi % 2 == 0 else -0.15
        T_pc_cam = orbit_pose(2 * np.pi * vi / n_views, elev)
        qpc, tpc = SE3_to_quaternion_and_translation(
            jnp.asarray(T_pc_cam)[None])
        img = np.clip(np.asarray(render_gt(qpc, tpc)), 0, 1)
        path = os.path.join(img_dir, f"v{vi}.png")
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(path)
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T_pc_cam.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": H, "camera_width": W, "camera_id": 0,
        })
        print(f"rendered GT view {vi + 1}/{n_views}", flush=True)
    n_train, n_val = _write_dataset(records, out_dir)

    import pandas as pd
    keep = rng.random(n_points) < 0.5
    init_pc = pc[keep] + rng.normal(scale=0.03, size=(int(keep.sum()), 3))
    parquet = os.path.join(out_dir, "point_cloud.parquet")
    pd.DataFrame(init_pc.astype(np.float32), columns=["x", "y", "z"]
                 ).to_parquet(parquet)

    config = TrainConfig(
        train_dataset_json_path=os.path.join(out_dir, "train.json"),
        val_dataset_json_path=os.path.join(out_dir, "val.json"),
        pointcloud_parquet_path=parquet,
        num_iterations=iters,
        batch_size=batch,
        mesh_devices=mesh,
        # batch-compensation A/B knobs (benchmark/batch_parity.py ladder)
        scale_lr_with_batch=os.environ.get("QB_LR_SCALE", "sqrt"),
        scale_betas_with_batch=os.environ.get("QB_SCALE_BETAS", "0") == "1",
        val_interval=max(iters // 8, 100),
        feature_learning_rate=0.01,
        position_learning_rate=2e-4,
        position_learning_rate_decay_rate=0.995,
        # cadences below are denominated in IMAGES SEEN (iters * batch):
        # the trainer's scale_schedules_with_batch divides them back by the
        # batch size, so single-view and batch runs at equal images get
        # identical per-image schedules (batch-parity protocol)
        increase_color_max_sh_band_interval=max(iters * batch // 8, 100),
        initial_downsample_factor=1,
        log_loss_interval=100,
        log_metrics_interval=100,
        log_image_interval=10 ** 9,
        log_validation_image=False,
        save_full_checkpoint=False,
        summary_writer_log_dir=os.path.join(out_dir, "logs"),
        rasterisation_config=cfg,
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=200,
            num_iterations_densify=100,
            # FULL controller: alpha reset (3 resets over the 2000-iteration
            # default run) and floater removal both ACTIVE
            num_iterations_reset_alpha=max(iters * batch // 4, 100),
            reset_alpha_value=-1.0,
            iteration_start_remove_floater=max(iters * batch // 8, 100),
            # orbit radius 2.5, scene radius ~0.7: anything splatting >1/4
            # of the frame from closer than 1.2 units is a floater
            floater_depth_threshold=1.2,
            floater_near_camrea_num_pixels_threshold=(res * res) // 4,
            densification_view_space_position_gradients_threshold=1e-5,
            under_reconstructed_num_pixels_threshold=4000,
            transparent_alpha_threshold=-2.0),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=5.0, initial_alpha=0.5,
            max_initial_covariance=0.1),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    trainer.train()

    _summarize(out_dir, {
        "metric": "synthetic_holdout_psnr",
        "resolution": res, "views": n_views, "iterations": iters,
        "batch_size": batch,
        "holdout_views": n_val,
    })


def main_full():
    """Reference-scale campaign: out-of-model GT, 976x544, 30k iterations,
    full controller, measured wall-clock. ~35-40 min on one v5e chip."""
    from procedural_scene import (orbit_pose, render_view,
                                  sample_init_points)

    iters = int(os.environ.get("QB_FULL_ITERS", "30000"))
    n_views = int(os.environ.get("QB_FULL_VIEWS", "48"))
    n_init = int(os.environ.get("QB_FULL_POINTS", "30000"))
    ratio = float(os.environ.get("QB_FULL_RATIO", "6.0"))
    # each distinct downsample factor is one full TPU-backend compile of the
    # train step (25+ min each at this scale); QB_FULL_DOWNSAMPLE=1 trades
    # the reference's coarse-to-fine warmup for two fewer compiles
    downsample = int(os.environ.get("QB_FULL_DOWNSAMPLE", "4"))
    # texture detail octaves: QB_FULL_DETAIL > 0 adds multi-octave value
    # noise to every surface - high-frequency out-of-model content that
    # drives densification into the reference's 400k+ point regime
    # (the round-4 detail-0 campaign plateaued at 171k points)
    detail = int(os.environ.get("QB_FULL_DETAIL", "0"))
    out_dir = os.environ.get("QB_OUT", "/tmp/quality_benchmark_full")
    os.makedirs(out_dir, exist_ok=True)

    import PIL.Image
    import pandas as pd
    from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer, TrainConfig)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        LossFunctionConfig)

    # reference render/benchmark resolution + intrinsics
    # (gaussian_point_render.py:26-27); QB_FULL_RES=WxH overrides for
    # cheap plumbing smokes (focal scales with width)
    w, h = (int(x) for x in
            os.environ.get("QB_FULL_RES", "976x544").split("x"))
    f = 581.743 * (w / 976.0)
    intr = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    records = []
    rng = np.random.default_rng(0)
    for vi in range(n_views):
        elev = (0.38, 0.18, 0.55)[vi % 3]  # three elevation rings
        T = orbit_pose(2 * np.pi * vi / n_views + 0.05 * (vi % 3), elev)
        suffix = f"_d{detail}" if detail else ""
        path = os.path.join(
            img_dir, f"v{vi:03d}_of{n_views}_{w}x{h}{suffix}.png")
        # GT views are deterministic in (vi, n_views, w, h) - poses don't
        # consume the rng - so pre-rendered images (the ray tracer costs
        # ~22 s/view at 976x544 on this rig's single CPU) are reusable
        # across restarts; the filename carries the FULL determinism key
        # including n_views (the pose angle is 2*pi*vi/n_views, so a rerun
        # with a different QB_FULL_VIEWS must not reuse stale poses)
        if not os.path.exists(path):
            img = render_view(T, intr, h, w, detail=detail)
            tmp_path = path + ".tmp.png"
            PIL.Image.fromarray((img * 255).astype(np.uint8)).save(tmp_path)
            os.replace(tmp_path, path)
            print(f"rendered GT view {vi + 1}/{n_views}", flush=True)
        else:
            print(f"reusing GT view {vi + 1}/{n_views}", flush=True)
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T.tolist(),
            "camera_intrinsics": intr.tolist(),
            "camera_height": h, "camera_width": w, "camera_id": 0,
        })
    n_train, n_val = _write_dataset(records, out_dir)
    if os.environ.get("QB_GT_ONLY", "0") == "1":
        print("QB_GT_ONLY=1: ground-truth views written, exiting", flush=True)
        return None

    pc, rgb = sample_init_points(n_init, rng, detail=detail)
    parquet = os.path.join(out_dir, "point_cloud.parquet")
    pd.DataFrame(
        np.concatenate([pc, rgb], axis=1),
        columns=["x", "y", "z", "r", "g", "b"]).to_parquet(parquet)

    # protocol shape: reference config/tat_truck_every_8_test.yaml
    config = TrainConfig(
        train_dataset_json_path=os.path.join(out_dir, "train.json"),
        val_dataset_json_path=os.path.join(out_dir, "val.json"),
        pointcloud_parquet_path=parquet,
        num_iterations=iters,
        val_interval=max(iters // 15, 500),
        feature_learning_rate=0.005,
        position_learning_rate=5e-5,
        position_learning_rate_decay_rate=0.9947,
        position_learning_rate_decay_interval=100,
        increase_color_max_sh_band_interval=1000,
        initial_downsample_factor=downsample,
        half_downsample_factor_interval=250,
        log_loss_interval=100,
        log_metrics_interval=100,
        log_image_interval=10 ** 9,
        log_validation_image=False,
        save_full_checkpoint=False,
        summary_writer_log_dir=os.path.join(out_dir, "logs"),
        # scene-derived budgets + self-healing: auto_capacity probes the
        # INITIAL scene (emits only ~32k keys at 976x544); densification
        # grows the workload ~15x, so the capacity_recovery path re-probes
        # the live scene and recompiles when the overflow guard trips (the
        # round-4 campaign measured exactly this: hand-set budgets
        # overflowed at iteration ~2040, one recovery grew the ladder, zero
        # dropped work afterwards). QB_FULL_AUTO=0 falls back to the
        # hand-set round-3 ladder. Oversizing is not free either way:
        # emission-buffer size drove the TPU-backend compile past 25 min
        # per shape at max_keys=2^21
        auto_capacity=os.environ.get("QB_FULL_AUTO", "1") == "1",
        auto_capacity_headroom=4.0,
        rasterisation_config=RasterizerConfig(
            near_plane=0.4, far_plane=2000.0,
            depth_to_sort_key_scale=10.0,
            max_keys=2 ** int(os.environ.get("QB_FULL_MAX_KEYS_LOG2", "20")),
            pool_slots=(4, 8, 16, 32, 64, 128, 256),
            pool_caps=(65536, 16384, 8192, 4096, 2048, 512, 128)),
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=1000,
            num_iterations_densify=100,
            num_iterations_reset_alpha=4000,   # ACTIVE (reference cadence)
            # LOGIT clamp ceiling, like the reference's (its 0.1 default is
            # a logit: alpha <= sigmoid(0.1) = 0.52, a mild moderation).
            # Round 4 used -1.9 here (alpha <= 0.13, a 4x harsher clamp)
            # and its trajectory dipped ~9 dB at every reset
            # (reference: GaussianPointAdaptiveController.py:72,355-358)
            reset_alpha_value=0.1,
            iteration_start_remove_floater=2000,  # ACTIVE
            floater_num_pixels_threshold=400000,
            floater_near_camrea_num_pixels_threshold=300000,
            transparent_alpha_threshold=-2.0,
            # lower threshold -> more aggressive densification; the knob
            # exists to push campaigns into the reference's 400k+ point
            # regime (reference Truck lands at 428,687, README.md:66)
            densification_view_space_position_gradients_threshold=float(
                os.environ.get("QB_FULL_DENSIFY_TH", "3e-6")),
            under_reconstructed_num_pixels_threshold=32,
            under_reconstructed_move_factor=10.0,
            gaussian_split_factor_phi=1.6),
        gaussian_point_cloud_scene_config=SceneConfig(
            max_num_points_ratio=ratio,
            add_sphere=True,                   # background shell for the sky
            initial_alpha=0.05,
            initial_covariance_ratio=0.1,
            max_initial_covariance=3000.0),
        loss_function_config=LossFunctionConfig(enable_regularization=False),
    )
    trainer = GaussianPointCloudTrainer(config)
    t0 = time.perf_counter()
    trainer.train()
    wall = time.perf_counter() - t0

    meta = _summarize(out_dir, {
        "metric": "procedural_fullres_holdout_psnr",
        "resolution": f"{w}x{h}", "views": n_views,
        "holdout_views": n_val, "iterations": iters,
        "init_points": n_init, "pool_capacity": trainer.scene.capacity,
        "wall_clock_minutes": round(wall / 60.0, 1),
    })
    return meta


if __name__ == "__main__":
    if "--full" in sys.argv:
        main_full()
    else:
        main_quick()
