"""SSIM / loss / controller unit tests."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.training.ssim import ssim, psnr
from taichi_3d_gaussian_splatting_tpu.training.loss import (
    LossFunction, LossFunctionConfig)
from taichi_3d_gaussian_splatting_tpu.training.controller import (
    AdaptiveControllerConfig, ControllerState, densify_step, reset_alpha,
    update_stats)
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianPointCloudScene, SceneConfig)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import BackwardStats


def _ssim_numpy(img1, img2, data_range=1.0):
    """Independent numpy transcription of pytorch_msssim's _ssim (gaussian
    window 11/1.5, valid padding, per-channel)."""
    from scipy.ndimage import correlate1d
    win = np.arange(11) - 5
    g = np.exp(-(win ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()

    def blur(x):
        # valid-mode separable filtering per channel
        out = []
        for c in range(x.shape[2]):
            y = correlate1d(x[:, :, c], g, axis=0, mode="constant")
            y = correlate1d(y, g, axis=1, mode="constant")
            out.append(y[5:-5, 5:-5])
        return np.stack(out, axis=2)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1, mu2 = blur(img1), blur(img2)
    s11 = blur(img1 * img1) - mu1 * mu1
    s22 = blur(img2 * img2) - mu2 * mu2
    s12 = blur(img1 * img2) - mu1 * mu2
    cs = (2 * s12 + c2) / (s11 + s22 + c2)
    m = ((2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)) * cs
    return m.mean()


def test_ssim_matches_numpy_reference():
    rng = np.random.default_rng(0)
    a = rng.random((40, 48, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.array(a), jnp.array(b)))
    want = _ssim_numpy(a, b)
    assert abs(got - want) < 1e-4, (got, want)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.array(a), jnp.array(a))) > 0.9999


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4


def test_loss_weighting():
    cfg = LossFunctionConfig(lambda_value=0.2, enable_regularization=False)
    loss_fn = LossFunction(cfg)
    rng = np.random.default_rng(2)
    a = jnp.array(rng.random((32, 32, 3)), jnp.float32)
    b = jnp.array(rng.random((32, 32, 3)), jnp.float32)
    loss, l1, ld_ssim = loss_fn(a, b)
    np.testing.assert_allclose(float(loss),
                               0.8 * float(l1) + 0.2 * float(ld_ssim),
                               rtol=1e-6)


def test_regularization_loss_masked():
    cfg = LossFunctionConfig(enable_regularization=True,
                             regularization_weight=1.0, lambda_value=0.0)
    loss_fn = LossFunction(cfg)
    feats = np.zeros((4, 56), np.float32)
    feats[:, 4:7] = np.log(2.0)  # exp(s) = 2 -> norm = 2*sqrt(3)
    invalid = np.array([0, 0, 1, 1], np.int8)
    img = jnp.zeros((32, 32, 3))
    loss, l1, _ = loss_fn(img, img, jnp.array(invalid), jnp.array(feats))
    want_reg = 2.0 * np.sqrt(3.0)
    np.testing.assert_allclose(float(loss), want_reg, rtol=1e-5)


def _scene(n=16, seed=0):
    rng = np.random.default_rng(seed)
    pc = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 56)).astype(np.float32) * 0.1
    feats[:, 7] = 2.0  # opaque-ish
    return GaussianPointCloudScene.from_arrays(
        pc, SceneConfig(max_num_points_ratio=2.0),
        point_cloud_features=feats)


def _stats(n, mag=None, npix=None):
    return BackwardStats(
        grad_viewspace=jnp.zeros((n, 2)),
        magnitude_grad_viewspace=jnp.zeros((n,)) if mag is None else jnp.array(mag),
        num_affected_pixels=(jnp.zeros((n,), jnp.int32) if npix is None
                             else jnp.array(npix, jnp.int32)),
        magnitude_grad_viewspace_on_image=jnp.zeros((4, 4, 2)),
    )


def test_update_stats_accumulates_only_in_frustum():
    n = 4
    state = ControllerState.zeros(n)
    stats = _stats(n, mag=[1.0, 2.0, 3.0, 4.0], npix=[10, 20, 30, 0])
    in_frustum = jnp.array([True, True, False, True])
    grad_pc = jnp.ones((n, 3))
    state = update_stats(state, stats, grad_pc, in_frustum)
    np.testing.assert_array_equal(np.asarray(state.accumulated_num_in_camera),
                                  [1, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(state.accumulated_num_pixels),
                                  [10, 20, 0, 0])
    np.testing.assert_allclose(np.asarray(state.accumulated_view_space_grad),
                               [1, 2, 0, 4])
    # avg = mag/npix, nan (0/0) -> 0
    np.testing.assert_allclose(
        np.asarray(state.accumulated_view_space_grad_avg),
        [0.1, 0.1, 0, 0])


def test_densify_split_and_clone():
    n_orig = 16
    scene = _scene(n_orig)
    n = scene.capacity
    state = ControllerState.zeros(n)
    # accumulate stats: point 0 over-reconstructed (many pixels), point 1
    # under-reconstructed; both have high viewspace grads
    stats = _stats(n)
    in_frustum = jnp.arange(n) < n_orig
    state = update_stats(
        state,
        _stats(n, mag=np.where(np.arange(n) < 2, 1.0, 0.0),
               npix=np.where(np.arange(n) == 0, 1000, 5)),
        jnp.ones((n, 3)) * 0.001, in_frustum)

    cfg = AdaptiveControllerConfig(
        num_iterations_warm_up=0,
        densification_view_space_position_gradients_threshold=0.5,
        under_reconstructed_num_pixels_threshold=512,
        iteration_start_remove_floater=10**9,
        transparent_alpha_threshold=-100.0,
    )
    trigger_stats = _stats(n, mag=np.where(np.arange(n) < 2, 1.0, 0.0),
                           npix=np.where(np.arange(n) == 0, 1000, 5))
    new_scene, new_state, counts = densify_step(
        scene, state, trigger_stats, in_frustum,
        jnp.full((n,), 5.0), scene.point_cloud, jnp.int32(100),
        jax.random.PRNGKey(0), cfg)
    assert int(counts.num_candidates) == 2
    assert int(counts.num_fillable) == 2
    assert int(counts.num_over_reconstructed) == 1
    assert int(counts.num_valid_after) == n_orig + 2
    # split source (point 0) shrank
    f_old = np.asarray(scene.point_cloud_features)
    f_new = np.asarray(new_scene.point_cloud_features)
    np.testing.assert_allclose(f_new[0, 4:7],
                               f_old[0, 4:7] - np.log(1.6), atol=1e-5)
    # clone source (point 1) unchanged scale
    np.testing.assert_allclose(f_new[1, 4:7], f_old[1, 4:7], atol=1e-6)
    # accumulators reset
    assert int(np.asarray(new_state.accumulated_num_in_camera).sum()) == 0


def test_densify_removes_transparent():
    scene = _scene(16)
    n = scene.capacity
    feats = np.asarray(scene.point_cloud_features).copy()
    feats[3, 7] = -5.0  # transparent
    feats[5, 8] = np.nan  # NaN features also pruned
    scene = scene._replace(point_cloud_features=jnp.array(feats))
    cfg = AdaptiveControllerConfig(
        transparent_alpha_threshold=-0.5,
        densification_view_space_position_gradients_threshold=1e9,
        iteration_start_remove_floater=10**9)
    new_scene, _, counts = densify_step(
        scene, ControllerState.zeros(n), _stats(n),
        jnp.zeros((n,), bool), jnp.full((n,), 5.0), scene.point_cloud,
        jnp.int32(100), jax.random.PRNGKey(0), cfg)
    assert int(counts.num_transparent) == 2
    inv = np.asarray(new_scene.point_invalid_mask)
    assert inv[3] == 1 and inv[5] == 1
    assert int(counts.num_valid_after) == 14


def test_densify_floater_removal():
    scene = _scene(16)
    n = scene.capacity
    cfg = AdaptiveControllerConfig(
        floater_near_camrea_num_pixels_threshold=100,
        floater_depth_threshold=10.0,
        iteration_start_remove_floater=50,
        transparent_alpha_threshold=-100.0,
        densification_view_space_position_gradients_threshold=1e9)
    npix = np.zeros(n); npix[2] = 500  # floater candidate
    depth = np.full((n,), 5.0)
    in_frustum = jnp.ones((n,), bool) & (jnp.arange(n) < 16)
    new_scene, _, counts = densify_step(
        scene, ControllerState.zeros(n), _stats(n, npix=npix),
        in_frustum, jnp.array(depth, jnp.float32), scene.point_cloud,
        jnp.int32(100), jax.random.PRNGKey(0), cfg)
    assert int(counts.num_floaters) == 1
    assert np.asarray(new_scene.point_invalid_mask)[2] == 1


def test_reset_alpha():
    scene = _scene(8)
    cfg = AdaptiveControllerConfig(reset_alpha_value=0.1)
    new_scene = reset_alpha(scene, cfg)
    alpha = np.asarray(new_scene.point_cloud_features)[:, 7]
    assert (alpha <= 0.1 + 1e-6).all()


def test_ssim_bounded_on_large_images():
    """Regression: TPU convs default to bf16 and made sigma estimates
    negative enough to blow past the C2 stabilizer (SSIM > 10). With pinned
    precision SSIM must stay in [-1, 1 + eps] on any backend."""
    rng = np.random.default_rng(7)
    a = jnp.array(rng.random((272, 480, 3)).astype(np.float32))
    b = jnp.clip(a + 0.05 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    v = float(ssim(a, b))
    assert -1.0 <= v <= 1.0 + 1e-3, v
    const = jnp.full((272, 480, 3), 0.9)
    v2 = float(ssim(const, jnp.clip(const + 0.001, 0, 1)))
    assert -1.0 <= v2 <= 1.0 + 1e-3, v2


def test_densify_scatter_figure():
    """The densification debug scatter (reference:
    GaussianPointAdaptiveController.py:267-283) renders from the masks
    densify_step now returns."""
    import numpy as np
    from taichi_3d_gaussian_splatting_tpu.utils.visualization import (
        densify_scatter_figure)
    rng = np.random.default_rng(0)
    n = 50
    uv = rng.uniform(0, 64, (n, 2)).astype(np.float32)
    floater = rng.random(n) < 0.1
    over = (rng.random(n) < 0.2) & ~floater
    under = (rng.random(n) < 0.2) & ~floater & ~over
    img = densify_scatter_figure(uv, floater, over, under, 64, 64)
    assert img is not None
    assert img.ndim == 3 and img.shape[2] == 3
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_uint8_device_cache_is_lossless():
    """The device dataset cache stores uint8 (4x smaller upload through the
    remote-TPU tunnel); _cache_image_to_float must reproduce the PNG-sourced
    float image EXACTLY, and f32 stacks must pass through untouched."""
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        _cache_image_to_float, _LazyCacheImage)
    rng = np.random.default_rng(3)
    # PNG-sourced data: floats that are exactly k/255
    u8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    img_f = u8.astype(np.float32) / 255.0
    stored = jnp.asarray(np.round(img_f * 255.0).astype(np.uint8))
    back = np.asarray(_cache_image_to_float(stored))
    np.testing.assert_array_equal(back, img_f)
    # f32 passthrough
    f32 = jnp.asarray(img_f)
    assert _cache_image_to_float(f32) is f32
    # lazy panel fetch converts too
    lazy = _LazyCacheImage(stored, 1)
    np.testing.assert_array_equal(lazy.fetch(), img_f[1])
    assert lazy.fetch().dtype == np.float32


def test_batch_schedule_scaling():
    """batch_size > 1 divides iteration-denominated schedules by the batch
    size (per-image cadence parity with the single-view reference protocol;
    the raw cadences cost ~2 dB at equal images seen - benchmark/README.md
    batch-parity section). Opt-out via scale_schedules_with_batch."""
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainConfig, _scale_schedules_for_batch)
    from taichi_3d_gaussian_splatting_tpu.training.controller import (
        AdaptiveControllerConfig)

    base = TrainConfig(
        train_dataset_json_path="x", val_dataset_json_path="x",
        pointcloud_parquet_path="x",
        batch_size=8,
        increase_color_max_sh_band_interval=1000,
        half_downsample_factor_interval=250,
        position_learning_rate_decay_interval=100,
        adaptive_controller_config=AdaptiveControllerConfig(
            num_iterations_warm_up=500, num_iterations_densify=100,
            num_iterations_reset_alpha=3000),
    )
    scaled = _scale_schedules_for_batch(base)
    assert scaled.increase_color_max_sh_band_interval == 125
    # LR compensation (default sqrt; measured -3.03 -> -1.65 dB)
    assert abs(scaled.feature_learning_rate
               - base.feature_learning_rate * 8 ** 0.5) < 1e-9
    assert abs(scaled.position_learning_rate
               - base.position_learning_rate * 8 ** 0.5) < 1e-9
    assert scaled.half_downsample_factor_interval == 31
    assert scaled.position_learning_rate_decay_interval == 12
    ctrl = scaled.adaptive_controller_config
    assert ctrl.num_iterations_warm_up == 62
    assert ctrl.num_iterations_densify == 12
    assert ctrl.num_iterations_reset_alpha == 375
    # floors at 1, never 0 (modulo by the cadence)
    tiny = _scale_schedules_for_batch(
        dataclasses.replace(base, position_learning_rate_decay_interval=4))
    assert tiny.position_learning_rate_decay_interval == 1
    # opt-out and batch_size == 1 are no-ops
    off = _scale_schedules_for_batch(
        dataclasses.replace(base, scale_schedules_with_batch=False))
    assert off.half_downsample_factor_interval == 250
    # LR knob is independent of the cadence knob
    assert abs(off.feature_learning_rate
               - base.feature_learning_rate * 8 ** 0.5) < 1e-9
    lin = _scale_schedules_for_batch(
        dataclasses.replace(base, scale_lr_with_batch="linear"))
    assert abs(lin.feature_learning_rate
               - base.feature_learning_rate * 8) < 1e-9
    none = _scale_schedules_for_batch(
        dataclasses.replace(base, scale_lr_with_batch="none"))
    assert none.feature_learning_rate == base.feature_learning_rate
    one = _scale_schedules_for_batch(dataclasses.replace(base, batch_size=1))
    assert one.half_downsample_factor_interval == 250
