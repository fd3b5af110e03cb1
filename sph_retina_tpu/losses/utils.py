"""Loss reduction helpers (mmdet ``weighted_loss`` semantics, mask-aware).

On TPU everything is padded + masked, so ``weight`` doubles as the validity
mask and ``avg_factor`` carries the true sample count
(reference semantics: mmdet/models/losses/utils.py via @weighted_loss,
consumed at e.g. /root/reference/sphdet/losses/sph2pob_iou_loss.py:104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce_loss(
    loss: jax.Array,
    weight: jax.Array | None = None,
    reduction: str = "mean",
    avg_factor: jax.Array | float | None = None,
) -> jax.Array:
    """Apply elementwise weight then reduce.

    ``avg_factor`` overrides the denominator of the mean (the number of
    *valid* samples in a padded batch).
    """
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction != "mean":
        raise ValueError(f"unknown reduction {reduction!r}")
    if avg_factor is None:
        if weight is not None:
            denom = jnp.maximum(jnp.sum(weight), 1e-6)
        else:
            denom = loss.size
        return jnp.sum(loss) / denom
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def reduce_box_weight(weight: jax.Array | None) -> jax.Array | None:
    """(N, D) per-coordinate weights -> (N,) per-box (mmdet convention)."""
    if weight is not None and weight.ndim > 1:
        return jnp.mean(weight, axis=-1)
    return weight
