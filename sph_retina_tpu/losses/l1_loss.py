"""L1-family regression losses.

- ``sph_l1_loss``: plain L1 on (encoded) box parameters — the reference's
  ``SphL1Loss`` is mmdet's stock L1Loss re-exported
  (/root/reference/sphdet/losses/__init__.py:1).
- ``sph2pob_l1_loss``: L1 on 5-dof deltas of the Sph2Pob-transformed pair
  (/root/reference/sphdet/losses/sph2pob_l1_loss.py:11-96; we drop its stray
  ``pdb.set_trace`` and keep the delta/angle-wrap semantics).
- ``smooth_l1_loss``: standard beta-smoothed variant (mmdet SmoothL1Loss).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .sph2pob_loss import sph2pob_pairs
from .utils import weight_reduce_loss


def l1_terms(pred, target):
    return jnp.abs(pred - target)


def smooth_l1_terms(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def sph_l1_loss(pred, target, weight=None, *, reduction="mean", avg_factor=None,
                loss_weight: float = 1.0):
    return loss_weight * weight_reduce_loss(
        l1_terms(pred, target), weight, reduction, avg_factor
    )


def smooth_l1_loss(pred, target, weight=None, *, beta: float = 1.0,
                   reduction="mean", avg_factor=None, loss_weight: float = 1.0):
    return loss_weight * weight_reduce_loss(
        smooth_l1_terms(pred, target, beta), weight, reduction, avg_factor
    )


def _wrap_angle(angle, modifier: str):
    if modifier == "original":
        return angle
    if modifier == "modulus":
        return (angle + math.pi) % math.pi
    raise ValueError(f"unsupported angle modifier {modifier!r}")


def obb2delta(proposals, gt, angle_modifier: str = "original", eps: float = 1e-7):
    """5-dof deltas of gt w.r.t. proposals (both (..., 5) rotated boxes)."""
    px, py, pw, ph, pa = (proposals[..., i] for i in range(5))
    gx, gy, gw, gh, ga = (gt[..., i] for i in range(5))
    pw, ph = jnp.maximum(pw, eps), jnp.maximum(ph, eps)
    gw, gh = jnp.maximum(gw, eps), jnp.maximum(gh, eps)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    da = (_wrap_angle(ga, angle_modifier) - _wrap_angle(pa, angle_modifier)) / math.pi
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def sph2pob_l1_loss(
    pred,
    target,
    weight=None,
    *,
    transform: str = "sph2pob_standard",
    encode: bool = True,
    swap: bool = False,
    angle_modifier: str = "original",
    reduction: str = "mean",
    avg_factor=None,
    loss_weight: float = 1.0,
):
    """L1 on Sph2Pob deltas; spherical degree boxes in (..., 4|5)."""
    box_version = target.shape[-1]
    pob_p, pob_t = sph2pob_pairs(pred, target, transform)
    if encode:
        if swap:
            deltas = obb2delta(pob_t, pob_p, angle_modifier)
        else:
            deltas = obb2delta(pob_p, pob_t, angle_modifier)
        loss = jnp.abs(deltas)
    else:
        loss = jnp.abs(pob_p - pob_t)
    if weight is not None and weight.ndim == loss.ndim and box_version == 4:
        # reference pads (N, 4) weights with their mean for the angle column
        # (sph2pob_transform.py:33-35)
        weight = jnp.concatenate(
            [weight, jnp.mean(weight, axis=-1, keepdims=True)], axis=-1
        )
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)
