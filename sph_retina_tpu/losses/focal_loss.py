"""Sigmoid focal loss and cross-entropy — pure jnp.

The reference classification path wraps mmcv's CUDA ``sigmoid_focal_loss``
(vendored mmdet/models/losses/focal_loss.py); under XLA the pure formulation
fuses into a handful of VPU ops, so no custom kernel is needed.
Semantics: per-class sigmoid, background encoded as label == num_classes
(one-hot of all zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import weight_reduce_loss


def sigmoid_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    weight: jax.Array | None = None,
    *,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reduction: str = "mean",
    avg_factor=None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Focal loss for (N, C) logits and (N,) integer labels in [0, C].

    label == C means background (all-zero one-hot target).
    """
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * pt**gamma
    bce = _bce_with_logits(logits, target)
    loss = bce * focal_weight
    if weight is not None and weight.ndim + 1 == loss.ndim:
        weight = weight[..., None]
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


def _bce_with_logits(logits, target):
    # log(1 + exp(-|x|)) formulation, numerically stable
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    weight: jax.Array | None = None,
    *,
    reduction: str = "mean",
    avg_factor=None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Softmax CE for (N, C) logits, (N,) int labels (SSD classification)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)
