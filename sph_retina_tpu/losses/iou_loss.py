"""IoU-family regression losses on planar oriented boxes and spherical boxes.

Reference semantics: /root/reference/sphdet/losses/sph2pob_iou_loss.py
(obb_iou_loss:105-196 for iou/giou/diou/ciou on POBs; SphIoULoss:239-296 for
direct spherical IoU). The IoU itself is our differentiable sort-free clip
(the reference calls CUDA diff_iou_rotated_2d).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..boxes.formator import obb2hbb_xyxy
from ..iou.api import sph_overlaps
from ..iou.rotated import rotated_box_iou
from .sph2pob_loss import sph2pob_pairs
from .utils import reduce_box_weight, weight_reduce_loss


def obb_iou_loss_terms(pred: jax.Array, target: jax.Array, mode: str, eps: float = 1e-7):
    """Per-element iou-based loss for rotated boxes (..., 5), rad angles."""
    ious = jnp.clip(rotated_box_iou(pred, target), 0.0, 1.0)
    if mode == "iou":
        return 1.0 - ious

    hbb_p = obb2hbb_xyxy(pred)
    hbb_t = obb2hbb_xyxy(target)
    enc_tl = jnp.minimum(hbb_p[..., :2], hbb_t[..., :2])
    enc_br = jnp.maximum(hbb_p[..., 2:], hbb_t[..., 2:])
    enc_wh = jnp.maximum(enc_br - enc_tl, 0.0)

    if mode == "giou":
        int_tl = jnp.maximum(hbb_p[..., :2], hbb_t[..., :2])
        int_br = jnp.minimum(hbb_p[..., 2:], hbb_t[..., 2:])
        int_wh = jnp.maximum(int_br - int_tl, 0.0)
        area_enc = enc_wh[..., 0] * enc_wh[..., 1]
        area_int = int_wh[..., 0] * int_wh[..., 1]
        area_p = pred[..., 2] * pred[..., 3]
        area_t = target[..., 2] * target[..., 3]
        union = area_p + area_t - area_int
        ratio = jnp.clip((area_enc - union) / (area_enc + eps), 0.0, 1.0)
        return 1.0 - (ious - ratio)

    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps
    rho2 = (target[..., 0] - pred[..., 0]) ** 2 + (target[..., 1] - pred[..., 1]) ** 2
    center_term = jnp.clip(rho2 / c2, 0.0, 1.0)

    if mode == "diou":
        return 1.0 - (ious - center_term)

    if mode == "ciou":
        factor = 4.0 / math.pi**2
        v = factor * (
            jnp.arctan(target[..., 2] / (target[..., 3] + eps))
            - jnp.arctan(pred[..., 2] / (pred[..., 3] + eps))
        ) ** 2
        alpha = jax.lax.stop_gradient(
            (ious > 0.5).astype(v.dtype) * v / (1.0 - ious + v + eps)
        )
        return 1.0 - (ious - (center_term + alpha * v))

    raise ValueError(f"unsupported iou loss mode {mode!r}")


def sph2pob_iou_loss(
    pred: jax.Array,
    target: jax.Array,
    weight: jax.Array | None = None,
    *,
    mode: str = "iou",
    transform: str = "sph2pob_standard",
    eps: float = 1e-7,
    reduction: str = "mean",
    avg_factor=None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Sph2PobIoULoss: spherical boxes in degrees (..., 4|5)."""
    pob_p, pob_t = sph2pob_pairs(pred, target, transform)
    loss = obb_iou_loss_terms(pob_p, pob_t, mode, eps)
    weight = reduce_box_weight(weight)
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)


def sph_iou_loss(
    pred: jax.Array,
    target: jax.Array,
    weight: jax.Array | None = None,
    *,
    iou_calculator: str = "sph2pob_standard",
    reduction: str = "mean",
    avg_factor=None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """SphIoULoss: 1 - IoU straight from spherical inputs (degrees)."""
    ious = sph_overlaps(pred, target, iou_calculator, is_aligned=True)
    loss = 1.0 - jnp.clip(ious, 0.0, 1.0)
    weight = reduce_box_weight(weight)
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)
