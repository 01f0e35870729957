"""Training loss: L = (1-lambda) L1 + lambda (1-SSIM) + optional scale
regularizer (reference: LossFunction.py)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .ssim import ssim


@dataclasses.dataclass
class LossFunctionConfig:
    """reference: LossFunction.py:9-13."""
    lambda_value: float = 0.2
    enable_regularization: bool = True
    regularization_weight: float = 2.0


class LossFunction:
    def __init__(self, config: LossFunctionConfig):
        self.config = config

    def __call__(self, predicted_image, ground_truth_image,
                 point_invalid_mask=None, pointcloud_features=None):
        """Images are channel-last (H, W, 3) in [0, 1].

        Returns (L, L1, 1-SSIM) like the reference (reference: :20-38).
        """
        l1 = jnp.abs(predicted_image - ground_truth_image).mean()
        ld_ssim = 1.0 - ssim(predicted_image, ground_truth_image,
                             data_range=1.0)
        loss = ((1.0 - self.config.lambda_value) * l1
                + self.config.lambda_value * ld_ssim)
        if pointcloud_features is not None and self.config.enable_regularization:
            loss = loss + (self.config.regularization_weight
                           * self._regularization_loss(point_invalid_mask,
                                                       pointcloud_features))
        return loss, l1, ld_ssim

    @staticmethod
    def _regularization_loss(point_invalid_mask, pointcloud_features):
        """mean over valid points of ||exp(s)||_2 (reference: :40-51),
        computed masked instead of boolean-indexed for static shapes.
        The mask is applied BEFORE exp so an invalid slot with huge or NaN
        log-scales contributes exactly 0 instead of inf*0=NaN."""
        valid_b = point_invalid_mask == 0
        valid = valid_b.astype(jnp.float32)
        s = jnp.where(valid_b[:, None], pointcloud_features[:, 4:7], 0.0)
        norms = jnp.linalg.norm(jnp.exp(s), axis=1) * valid
        return jnp.sum(norms) / jnp.maximum(jnp.sum(valid), 1.0)
