"""Gaussian-modelled rotated-box losses: GWD, KLD, KFIoU — native jnp.

The reference delegates these to the external mmrotate package
(/root/reference/sphdet/losses/sph2pob_gd_loss.py:9,
sph2pob_kf_loss.py:10) after the Sph2Pob transform; here they are
implemented from the underlying papers:

- GWD: "Rethinking Rotated Object Detection with Gaussian Wasserstein
  Distance Loss" (ICML'21): W2^2 closed form for 2-D Gaussians.
- KLD: "Learning High-Precision Bounding Box for Rotated Object Detection
  via Kullback-Leibler Divergence" (NeurIPS'21).
- KFIoU: "The KFIoU Loss for Rotated Object Detection" (ICLR'23): overlap of
  the Gaussian product ("Kalman filter" fusion).

A rotated box (cx, cy, w, h, a) maps to N(mu, Sigma) with mu = (cx, cy),
Sigma = R diag(w^2/4, h^2/4) R^T. All 2x2 algebra is explicit scalar math
(det/trace/inverse) — no linalg calls, fully fusable and Pallas-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sph2pob_loss import sph2pob_pairs
from .utils import reduce_box_weight, weight_reduce_loss


def obb2gaussian(boxes: jax.Array):
    """(..., 5) rotated boxes -> (mu (..., 2), sigma components a11, a12, a22)."""
    cx, cy, w, h, ang = (boxes[..., i] for i in range(5))
    w = jnp.clip(w, 1e-7, 1e7)
    h = jnp.clip(h, 1e-7, 1e7)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    vx, vy = w * w / 4.0, h * h / 4.0
    a11 = vx * cos * cos + vy * sin * sin
    a12 = (vx - vy) * sin * cos
    a22 = vx * sin * sin + vy * cos * cos
    return jnp.stack([cx, cy], axis=-1), (a11, a12, a22)


def _postprocess(distance, fun: str, tau: float):
    """Distance -> loss mapping shared by GWD/KLD (paper's normalizer)."""
    if fun == "log1p":
        distance = jnp.log1p(distance)
    elif fun == "sqrt":
        distance = jnp.sqrt(jnp.clip(distance, 1e-7, None))
    elif fun != "none":
        raise ValueError(f"unsupported fun {fun!r}")
    if tau >= 1.0:
        return 1.0 - 1.0 / (tau + distance)
    return distance


def gwd_terms(pred, target, fun="log1p", tau=1.0, alpha=1.0, normalize=True):
    """Squared 2-Wasserstein distance loss between box Gaussians."""
    mu_p, (p11, p12, p22) = obb2gaussian(pred)
    mu_t, (t11, t12, t22) = obb2gaussian(target)

    xy_dist = jnp.sum((mu_p - mu_t) ** 2, axis=-1)
    tr_p = p11 + p22
    tr_t = t11 + t22
    det_p = p11 * p22 - p12 * p12
    det_t = t11 * t22 - t12 * t12
    # Tr[(Sp^1/2 St Sp^1/2)^1/2] = sqrt(Tr(Sp St) + 2 sqrt(det Sp det St))
    tr_pt = p11 * t11 + 2.0 * p12 * t12 + p22 * t22
    det_sqrt = jnp.sqrt(jnp.clip(det_p * det_t, 0.0, None))
    whr_dist = tr_p + tr_t - 2.0 * jnp.sqrt(
        jnp.clip(tr_pt + 2.0 * det_sqrt, 0.0, None)
    )
    dist = jnp.clip(xy_dist + alpha * alpha * whr_dist, 1e-6, None)
    if normalize:
        scale = 2.0 * jnp.clip(jnp.sqrt(jnp.sqrt(jnp.clip(det_sqrt, 1e-7, None))), 1e-7, None)
        dist = dist / scale
    return _postprocess(dist, fun, tau)


def kld_terms(pred, target, fun="log1p", tau=1.0, sqrt=True):
    """KL(pred || target) between box Gaussians."""
    mu_p, (p11, p12, p22) = obb2gaussian(pred)
    mu_t, (t11, t12, t22) = obb2gaussian(target)

    det_p = jnp.clip(p11 * p22 - p12 * p12, 1e-7, None)
    det_t = jnp.clip(t11 * t22 - t12 * t12, 1e-7, None)
    # inverse of target sigma
    i11, i12, i22 = t22 / det_t, -t12 / det_t, t11 / det_t
    d = mu_p - mu_t
    maha = i11 * d[..., 0] ** 2 + 2.0 * i12 * d[..., 0] * d[..., 1] + i22 * d[..., 1] ** 2
    trace = i11 * p11 + 2.0 * i12 * p12 + i22 * p22
    kl = 0.5 * (maha + trace - 2.0 + jnp.log(det_t / det_p))
    kl = jnp.clip(kl, 0.0, None)
    if sqrt:
        kl = jnp.sqrt(kl)
    return _postprocess(kl, fun, tau)


def kfiou_terms(pred, target, fun="none"):
    """KFIoU loss: Gaussian-product overlap ratio.

    V(Sigma) = 4 sqrt(det Sigma) (area of the 1-sigma box surrogate);
    the product Gaussian has Sigma_i = Sp (Sp + St)^-1 St.
    """
    _, (p11, p12, p22) = obb2gaussian(pred)
    _, (t11, t12, t22) = obb2gaussian(target)
    det_p = jnp.clip(p11 * p22 - p12 * p12, 1e-7, None)
    det_t = jnp.clip(t11 * t22 - t12 * t12, 1e-7, None)
    s11, s12, s22 = p11 + t11, p12 + t12, p22 + t22
    det_s = jnp.clip(s11 * s22 - s12 * s12, 1e-7, None)
    # det(Sp (Sp+St)^-1 St) = det_p * det_t / det_s
    det_i = det_p * det_t / det_s
    v_p = 4.0 * jnp.sqrt(det_p)
    v_t = 4.0 * jnp.sqrt(det_t)
    v_i = 4.0 * jnp.sqrt(det_i)
    kfiou = v_i / jnp.clip(v_p + v_t - v_i, 1e-7, None)
    # KFIoU's attainable max is 1/3 (identical boxes); rescale like the paper.
    kfiou = 3.0 * kfiou
    if fun == "ln":
        return -jnp.log(jnp.clip(kfiou, 1e-7, None) )
    if fun == "exp":
        return jnp.exp(1.0 - kfiou) - 1.0
    return 1.0 - jnp.clip(kfiou, 0.0, 1.0)


def _sph_wrapper(terms_fn):
    def loss_fn(pred, target, weight=None, *, transform="sph2pob_standard",
                reduction="mean", avg_factor=None, loss_weight: float = 1.0,
                center_weight: float = 0.0, **kwargs):
        pob_p, pob_t = sph2pob_pairs(pred, target, transform)
        loss = terms_fn(pob_p, pob_t, **kwargs)
        if center_weight:
            loss = loss + center_weight * jnp.sum(
                jnp.abs(pob_p[..., :2] - pob_t[..., :2]), axis=-1
            )
        weight = reduce_box_weight(weight)
        return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)
    return loss_fn


sph2pob_gwd_loss = _sph_wrapper(gwd_terms)
sph2pob_kld_loss = _sph_wrapper(kld_terms)
sph2pob_kf_loss = _sph_wrapper(kfiou_terms)
