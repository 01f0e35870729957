"""Multi-chip scaling via jax.sharding: multi-view data-parallel training.

The reference is strictly single-GPU with batch size hard-fixed to one image
per iteration (reference: README.md:298 lists batch training as TODO;
SURVEY.md section 2.4 confirms no distributed backend exists). This module is
therefore a capability *beyond* reference parity, built the TPU way:

- a 1-D `Mesh` over the "data" axis; the scene (point pool, optimizer state,
  controller accumulators) is replicated, the view batch is sharded;
- each chip rasterizes its own view(s) with the full Pallas pipeline;
- gradients and controller statistics are combined with `jax.lax.psum`
  inside `shard_map` - the collectives ride ICI, XLA schedules them;
- parameters update identically on every chip (replicated optimizer step),
  so no weight gather is ever needed.

The step has FULL parity with the single-chip trainer step
(training/trainer.py): quaternion re-normalization, SH-band curriculum
gradient masking, per-group gradient scaling, the regularizer's direct
feature gradients, controller statistics accumulation, densification
inputs (per-point stats / frustum / depth of the batch's LAST view,
matching the reference's "trigger frame" semantics), and the capacity
overflow counters. `GaussianPointCloudTrainer` uses it whenever
`batch_size > 1` (see training/trainer.py).

Gradient convention for batch > 1: gradients are *summed* over views, which
matches running the reference's accumulation for several frames before one
optimizer step; divide learning rates accordingly if per-view semantics are
wanted.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..camera import CameraInfo
from ..models.scene import GaussianPointCloudScene
from ..ops.rasterizer import RasterizerConfig, rasterize_with_vjp
from ..ops.sh import feature_sh_band_mask
from ..training.controller import ControllerState, update_stats
from ..training.loss import LossFunction
from ..training.ssim import psnr as psnr_fn


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_scene(scene: GaussianPointCloudScene, mesh: Mesh):
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)


def make_data_parallel_train_step(
    mesh: Mesh,
    camera_info: CameraInfo,
    raster_config: RasterizerConfig,
    loss_fn: LossFunction,
    feature_optimizer,
    position_optimizer,
    axis_name: str = "data",
    apply_grad_scaling: bool = True,
) -> Callable:
    """Build a jitted multi-view training step sharded over `mesh`.

    The returned function has signature
      step(scene, opt_feat, opt_pos, ctrl_state,
           images (B,H,W,3), qs (B,1,4), ts (B,1,3), intrinsics (B,3,3),
           sh_band ())
        -> (scene, opt_feat, opt_pos, ctrl_state, metrics, densify_inputs,
            last_view_maps)
    with B divisible by the mesh size. All views share the (static) image
    shape; intrinsics may differ per view. `densify_inputs` is the
    (stats, in_frustum, point_depth, point_uv) tuple of the LAST view in the
    batch, directly consumable by `training.controller.densify_step`;
    `last_view_maps` = (pred (H,W,3), depth (H,W), valid_count (H,W)) of the
    same view, for the trainer's image-panel logging.
    """
    from ..training.trainer import _grad_group_scale
    grad_scale = jnp.asarray(_grad_group_scale(raster_config))
    axis_size = mesh.shape[axis_name]

    def device_step(scene, opt_feat, opt_pos, ctrl_state, images, qs, ts,
                    intrinsics, sh_band):
        # local shard: (B_local, H, W, 3)
        feats = scene.point_cloud_features
        # floored norm: all-zero padding slots stay 0 instead of NaN
        # (see training/trainer.py)
        qn = feats[:, 0:4] / jnp.maximum(
            jnp.linalg.norm(feats[:, 0:4], axis=1, keepdims=True), 1e-12)
        feats = feats.at[:, 0:4].set(qn)
        scene = scene._replace(point_cloud_features=feats)
        band_mask = feature_sh_band_mask(sh_band)

        def view_grads(carry, view):
            image_gt, q, t, intr = view
            cam = dataclasses.replace(camera_info, camera_intrinsics=intr)
            result, vjp_fn = rasterize_with_vjp(
                scene.point_cloud, feats, scene.point_invalid_mask,
                scene.point_object_id, q, t, cam, raster_config)

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
            # band curriculum masking + per-group scaling on the rasterizer
            # path only (reference: :1102-1125), exactly as single-chip
            scale = grad_scale if apply_grad_scaling else 1.0
            grad_feats = (grad_feats_raster * scale * band_mask
                          + g_feats_direct)
            acc_pc, acc_feats, ctrl, _maps = carry
            maps = (img, result.depth,
                    result.pixel_valid_point_count.astype(jnp.float32))
            ctrl = update_stats(ctrl, stats, grad_pc, result.aux.in_frustum)
            view_out = (loss, l1, ld_ssim, psnr_fn(img, image_gt),
                        result.aux.key_overflow,
                        result.aux.big_point_overflow,
                        result.aux.tile_cap_overflow,
                        result.aux.total_keys,
                        result.aux.nonfinite_points,
                        stats.grad_viewspace,
                        stats.magnitude_grad_viewspace,
                        stats.num_affected_pixels,
                        result.aux.in_frustum,
                        result.aux.point_depth,
                        result.aux.point_uv)
            return (acc_pc + grad_pc, acc_feats + grad_feats, ctrl,
                    maps), view_out

        h, w = camera_info.camera_height, camera_info.camera_width
        init = (jnp.zeros_like(scene.point_cloud), jnp.zeros_like(feats),
                ctrl_state,
                # last-view image panels (pred, depth, valid count): carried
                # through the scan (overwritten per view) so only the final
                # view's maps survive - no per-view stacking
                (jnp.zeros((h, w, 3), jnp.float32),
                 jnp.zeros((h, w), jnp.float32),
                 jnp.zeros((h, w), jnp.float32)))
        (grad_pc, grad_feats, ctrl_local, last_maps), ys = jax.lax.scan(
            view_grads, init, (images, qs, ts, intrinsics))
        (losses, l1s, ssims, psnrs, key_ovf, big_ovf, cap_ovf, tot_keys,
         nonfin, gv, mag, npix, in_fr, pdepth, puv) = ys

        # combine across chips: the collectives ride ICI
        grad_pc = jax.lax.psum(grad_pc, axis_name)
        grad_feats = jax.lax.psum(grad_feats, axis_name)
        # controller accumulators: sum each chip's local additions
        ctrl_state_before = ctrl_state
        ctrl_state = jax.tree.map(
            lambda old, new: old + jax.lax.psum(new - old, axis_name),
            ctrl_state, ctrl_local)
        loss_mean = jax.lax.pmean(jnp.mean(losses), axis_name)
        l1_mean = jax.lax.pmean(jnp.mean(l1s), axis_name)
        ssim_mean = jax.lax.pmean(jnp.mean(ssims), axis_name)
        psnr_mean = jax.lax.pmean(jnp.mean(psnrs), axis_name)

        # densification inputs of the batch's LAST view (the reference's
        # trigger-frame semantics): it lives on the last chip; a masked psum
        # replicates it
        is_last = (jax.lax.axis_index(axis_name) == axis_size - 1
                   ).astype(jnp.float32)

        def from_last_f(x):  # float or int/bool via float carry
            xl = x[-1]
            if jnp.issubdtype(xl.dtype, jnp.floating):
                return jax.lax.psum(xl * is_last.astype(xl.dtype), axis_name)
            out = jax.lax.psum(
                xl.astype(jnp.float32) * is_last, axis_name)
            return out.astype(xl.dtype)

        from ..ops.rasterizer import BackwardStats
        last_stats = BackwardStats(
            grad_viewspace=from_last_f(gv),
            magnitude_grad_viewspace=from_last_f(mag),
            num_affected_pixels=from_last_f(npix),
            magnitude_grad_viewspace_on_image=jnp.zeros((1, 1, 2)),
        )
        last_in_frustum = from_last_f(in_fr.astype(jnp.int8)) > 0
        last_depth = from_last_f(pdepth)
        last_uv = from_last_f(puv)
        # last-view image panels (pred / depth / count), same masked-psum
        # replication as the densify inputs: restores the observability the
        # single-view step has (trainer logs [pred|gt|depth|count] panels)
        pred_image, depth_map, count_map = (
            jax.lax.psum(m * is_last.astype(m.dtype), axis_name)
            for m in last_maps)

        # numeric containment, exactly as the single-chip step
        # (training/trainer.py): zero non-finite per-point gradient rows
        # (0-cotangent x inf-jacobian at culled degenerate splats), skip the
        # whole update when any view's loss is non-finite (the summed image
        # poison would destroy every parameter in one Adam step)
        feat_row_ok = jnp.all(jnp.isfinite(grad_feats), axis=1,
                              keepdims=True)
        pc_row_ok = jnp.all(jnp.isfinite(grad_pc), axis=1, keepdims=True)
        nonfinite_grad_rows = jnp.sum(
            (~feat_row_ok[:, 0] | ~pc_row_ok[:, 0]).astype(jnp.int32))
        grad_feats = jnp.where(feat_row_ok, grad_feats, 0.0)
        grad_pc = jnp.where(pc_row_ok, grad_pc, 0.0)
        loss_ok = jnp.isfinite(loss_mean)

        def _keep_if_ok(new, old):
            return jax.tree.map(lambda a, b: jnp.where(loss_ok, a, b),
                                new, old)

        updates_f, new_opt_feat = feature_optimizer.update(
            grad_feats, opt_feat, feats)
        new_feats = jax.tree.map(jnp.add, feats, updates_f)
        updates_p, new_opt_pos = position_optimizer.update(
            grad_pc, opt_pos, scene.point_cloud)
        new_pc = jax.tree.map(jnp.add, scene.point_cloud, updates_p)
        new_feats = _keep_if_ok(new_feats, feats)
        new_pc = _keep_if_ok(new_pc, scene.point_cloud)
        opt_feat = _keep_if_ok(new_opt_feat, opt_feat)
        opt_pos = _keep_if_ok(new_opt_pos, opt_pos)
        ctrl_state = _keep_if_ok(ctrl_state, ctrl_state_before)
        scene = scene._replace(point_cloud=new_pc,
                               point_cloud_features=new_feats)
        metrics = {
            "loss": loss_mean, "l1": l1_mean, "ssim_loss": ssim_mean,
            "psnr": psnr_mean, "ssim": 1.0 - ssim_mean,
            "key_overflow": jax.lax.psum(jnp.sum(key_ovf), axis_name),
            "big_point_overflow": jax.lax.psum(jnp.sum(big_ovf), axis_name),
            "tile_cap_overflow": jax.lax.psum(jnp.sum(cap_ovf), axis_name),
            "total_keys": jax.lax.psum(jnp.sum(tot_keys), axis_name),
            "nonfinite_points": jax.lax.psum(jnp.sum(nonfin), axis_name),
            "nonfinite_grad_rows": nonfinite_grad_rows,
            "skipped_nonfinite_step": 1 - loss_ok.astype(jnp.int32),
        }
        densify_inputs = (last_stats, last_in_frustum, last_depth, last_uv)
        return (scene, opt_feat, opt_pos, ctrl_state, metrics,
                densify_inputs, (pred_image, depth_map, count_map))

    replicated = P()
    batched = P("data")
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(replicated, replicated, replicated, replicated,
                  batched, batched, batched, batched, replicated),
        out_specs=(replicated, replicated, replicated, replicated,
                   replicated, replicated, replicated),
        check_vma=False)
    return jax.jit(sharded)
