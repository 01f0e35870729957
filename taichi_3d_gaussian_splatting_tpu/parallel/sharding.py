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

Gradient convention for batch > 1: gradients are *summed* over views, which
matches running the reference's accumulation for several frames before one
optimizer step; divide learning rates accordingly if per-view semantics are
wanted.
"""

from __future__ import annotations

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
from ..training.controller import ControllerState, update_stats
from ..training.loss import LossFunction


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
           images (B,H,W,3), qs (B,1,4), ts (B,1,3), intrinsics (B,3,3))
        -> (scene, opt_feat, opt_pos, ctrl_state, metrics)
    with B divisible by the mesh size. All views share the (static) image
    shape; intrinsics may differ per view.
    """

    def device_step(scene, opt_feat, opt_pos, ctrl_state, images, qs, ts,
                    intrinsics):
        # local shard: (B_local, H, W, 3)
        feats = scene.point_cloud_features
        qn = feats[:, 0:4] / jnp.linalg.norm(feats[:, 0:4], axis=1,
                                             keepdims=True)
        feats = feats.at[:, 0:4].set(qn)
        scene = scene._replace(point_cloud_features=feats)

        def view_grads(carry, view):
            image_gt, q, t, intr = view
            import dataclasses
            cam = dataclasses.replace(camera_info, camera_intrinsics=intr)
            result, vjp_fn = rasterize_with_vjp(
                scene.point_cloud, feats, scene.point_invalid_mask,
                scene.point_object_id, q, t, cam, raster_config)

            def image_loss(image):
                img = jnp.clip(image, 0.0, 1.0)
                loss, l1, ld_ssim = loss_fn(
                    img, image_gt,
                    point_invalid_mask=scene.point_invalid_mask,
                    pointcloud_features=feats)
                return loss, (l1, ld_ssim)

            (loss, (l1, ld_ssim)), g_image = jax.value_and_grad(
                image_loss, has_aux=True)(result.image)
            grad_pc, grad_feats, stats = vjp_fn(g_image)
            acc_pc, acc_feats, ctrl = carry
            ctrl = update_stats(ctrl, stats, grad_pc, result.aux.in_frustum)
            return ((acc_pc + grad_pc, acc_feats + grad_feats, ctrl),
                    (loss, l1, ld_ssim))

        init = (jnp.zeros_like(scene.point_cloud), jnp.zeros_like(feats),
                ctrl_state)
        (grad_pc, grad_feats, ctrl_local), (losses, l1s, ssims) = \
            jax.lax.scan(view_grads, init, (images, qs, ts, intrinsics))

        # combine across chips: the collectives ride ICI
        grad_pc = jax.lax.psum(grad_pc, axis_name)
        grad_feats = jax.lax.psum(grad_feats, axis_name)
        if apply_grad_scaling:
            # per-group gradient scaling, same semantics as the single-chip
            # trainer (reference: GaussianPointCloudRasterisation.py:1105-1125)
            from ..training.trainer import _grad_group_scale
            grad_feats = grad_feats * jnp.asarray(
                _grad_group_scale(raster_config))
        # controller accumulators: sum each chip's local additions
        ctrl_state = jax.tree.map(
            lambda old, new: old + jax.lax.psum(new - old, axis_name),
            ctrl_state, ctrl_local)
        loss_mean = jax.lax.pmean(jnp.mean(losses), axis_name)
        l1_mean = jax.lax.pmean(jnp.mean(l1s), axis_name)
        ssim_mean = jax.lax.pmean(jnp.mean(ssims), axis_name)

        updates_f, opt_feat = feature_optimizer.update(grad_feats, opt_feat,
                                                       feats)
        new_feats = jax.tree.map(jnp.add, feats, updates_f)
        updates_p, opt_pos = position_optimizer.update(grad_pc, opt_pos,
                                                       scene.point_cloud)
        new_pc = jax.tree.map(jnp.add, scene.point_cloud, updates_p)
        scene = scene._replace(point_cloud=new_pc,
                               point_cloud_features=new_feats)
        metrics = {"loss": loss_mean, "l1": l1_mean, "ssim_loss": ssim_mean}
        return scene, opt_feat, opt_pos, ctrl_state, metrics

    replicated = P()
    batched = P("data")
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(replicated, replicated, replicated, replicated,
                  batched, batched, batched, batched),
        out_specs=(replicated, replicated, replicated, replicated,
                   replicated),
        check_vma=False)
    return jax.jit(sharded)
