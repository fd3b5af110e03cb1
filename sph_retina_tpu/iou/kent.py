"""Kent (Fisher-Bingham FB5) distribution subsystem — vectorized jnp.

The fork's addition to the reference: spherical boxes modelled as Kent
distributions on S^2, compared by KL divergence. Reference implementation is
a host-side per-box python loop over numpy/scipy
(sphdet/bbox/kent_formator.py:833-839 calls .cpu().numpy() per annotation!);
here the whole pipeline is closed-form batched jnp on device:

- ``deg2kent``: BFoV box -> Kent parameters by moment estimation over a
  fixed 11x11 tangent-grid sample (kent_formator.py:704-734, 468-501). The
  reference's ERP-pixel round trip collapses algebraically to a sign
  permutation (X = (-p_y, -p_z, -p_x)), and the 2x2 eigendecomposition is
  closed-form (half-angle atan2) — no scipy, no loops.
- ``kent_kld``: closed-form KL divergence (kent_iou_calculator.py:4-161)
  with every normalizer ratio computed analytically (c_k/c, c_kk/c,
  c_b/c, log c_b/c_a), so nothing exponentiates kappa — the reference's
  c_approximation overflows fp32 at kappa > 88.

Canonical parameter layout (fixes the reference's producer/consumer
mismatch, SURVEY.md §7): ``(kappa, beta, alpha, psi, eta)`` where the mean
direction is gamma1 = (cos(alpha), sin(alpha) cos(eta), sin(alpha) sin(eta))
— exactly what the KLD consumer expects. A property test asserts
deg2kent -> angles_to_gammas round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MIN_KAPPA = 1e-6
_EPS = 1e-12


# --------------------------------------------------------------------------- #
# angles <-> orthonormal frame
# --------------------------------------------------------------------------- #
def kent_angles_to_gammas(alpha, psi, eta):
    """(alpha, psi, eta) -> (gamma1, gamma2, gamma3), each (..., 3).

    Reference angles_to_Q (kent_iou_calculator.py:4-28).
    """
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    ce, se = jnp.cos(eta), jnp.sin(eta)
    g1 = jnp.stack([ca, sa * ce, sa * se], axis=-1)
    g2 = jnp.stack(
        [-cp * sa, cp * ca * ce - sp * se, cp * ca * se + sp * ce], axis=-1
    )
    g3 = jnp.stack(
        [sp * sa, -sp * ca * ce - cp * se, -sp * ca * se + cp * ce], axis=-1
    )
    return g1, g2, g3


# --------------------------------------------------------------------------- #
# deg2kent: moment estimation over the 11x11 tangent grid
# --------------------------------------------------------------------------- #
def _sample_box_points(boxes_rad):
    """(..., 4|5) radians -> (..., 121, 3) unit sphere samples.

    Reference sampleFromAnnotation_deg semantics: tangent grid scaled by the
    FoVs, rotated to the box center with Ry(lon) Rx(lat); the subsequent
    ERP-pixel round trip reduces to X = (-p_y, -p_z, -p_x).

    A 5th column (RBFoV gamma) rolls the tangent grid about the boresight
    before lifting, so the Kent backend sees box rotation (the reference's
    sampleFromAnnotation_deg is 4-dof only and its kent pipeline silently
    ignores gamma — rotation-blind kent IoU/loss for rotated boxes).
    """
    lon = boxes_rad[..., 0] - jnp.pi          # phi00
    # Keep the center strictly off the ERP poles: at phi = 0 or pi the Kent
    # mean direction hits alpha = 0/pi where the (alpha, psi, eta) frame is
    # singular — arccos has infinite gradient at +-1 and eta = atan2(0, 0)
    # NaNs the backward pass. Coder-decoded boxes land exactly on the
    # [0, 180] phi clamp early in training (the step-1 NaN of the
    # KLD-gradient Kent config; same pole class as the fov = pi guard
    # below). 1e-2 rad (~0.57 deg) bounds the arccos gradient at ~1e2.
    lat = jnp.clip(boxes_rad[..., 1] - jnp.pi / 2.0,
                   -(jnp.pi / 2.0 - 1e-2), jnp.pi / 2.0 - 1e-2)
    # Keep the FoVs strictly inside (0, pi): tan(fov/2) hits its pole at
    # fov = pi and its zero at fov = 0, and coder-decoded boxes land
    # exactly on the 180-deg clamp during early training — unguarded,
    # both extremes NaN the moment frame AND its gradient (the step-2 NaN
    # divergence of Kent training; the valid-box range is open anyway,
    # box_formator.py:119-127).
    fov_h = jnp.clip(boxes_rad[..., 2], 1e-3, jnp.pi - 1e-2)
    fov_v = jnp.clip(boxes_rad[..., 3], 1e-3, jnp.pi - 1e-2)

    r = 11
    idx = np.arange(-(r - 1) // 2, (r + 1) // 2, dtype=np.float32)
    ii, jj = np.meshgrid(idx, idx, indexing="ij")
    ii = jnp.asarray(ii.reshape(-1))  # (121,)
    jj = jnp.asarray(jj.reshape(-1))

    d_lat = r / (2.0 * jnp.tan(fov_v / 2.0))
    d_long = r / (2.0 * jnp.tan(fov_h / 2.0))
    # p = (i * d_lat/d_long, j, d_lat), normalized
    px = ii * (d_lat / d_long)[..., None]
    py = jj * jnp.ones_like(d_lat)[..., None]
    pz = d_lat[..., None] * jnp.ones_like(jj)
    if boxes_rad.shape[-1] == 5:
        gamma = boxes_rad[..., 4:5]
        cg, sg = jnp.cos(gamma), jnp.sin(gamma)
        px, py = px * cg - py * sg, px * sg + py * cg
    inv = jax.lax.rsqrt(px * px + py * py + pz * pz)
    px, py, pz = px * inv, py * inv, pz * inv

    # R = Ry(lon) @ Rx(lat); rotate p
    cl, sl = jnp.cos(lon)[..., None], jnp.sin(lon)[..., None]
    ct, st = jnp.cos(lat)[..., None], jnp.sin(lat)[..., None]
    # Rx(lat): (x, y cos - z sin, y sin + z cos)
    qx, qy, qz = px, py * ct - pz * st, py * st + pz * ct
    # Ry(lon): (x cos + z sin, y, -x sin + z cos)
    rx = qx * cl + qz * sl
    ry = qy
    rz = -qx * sl + qz * cl
    # ERP round trip == sign permutation
    return jnp.stack([-ry, -rz, -rx], axis=-1)  # (..., 121, 3)


def _kent_moments(boxes_rad: jax.Array):
    """Sample moments of the 11x11 tangent grid: (r1, r2, alpha, psi, eta).

    r1 = |mean resultant|, r2 = t22 - t33 in the moment frame
    (kent_formator.py:468-501 tlts_kent_me)."""
    xs = _sample_box_points(boxes_rad)  # (..., K, 3)

    xbar = jnp.mean(xs, axis=-2)  # (..., 3)
    S = jnp.mean(xs[..., :, None] * xs[..., None, :], axis=-3)  # (..., 3, 3)

    r1 = jnp.sqrt(jnp.sum(xbar * xbar, axis=-1))
    g1 = xbar / jnp.maximum(r1[..., None], _EPS)

    # arccos'(x) = -1/sqrt(1-x^2) is infinite at +-1; the 1e-7 margin
    # bounds the gradient (~2e3) without moving any non-degenerate frame
    alpha = jnp.arccos(jnp.clip(g1[..., 0], -1.0 + 1e-7, 1.0 - 1e-7))
    eta = jnp.arctan2(g1[..., 2], g1[..., 1])

    # H frame (kent_formator.py:110-115), rows of H^T
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    ce, se = jnp.cos(eta), jnp.sin(eta)
    h2 = jnp.stack([-sa, ca * ce, ca * se], axis=-1)
    h3 = jnp.stack([jnp.zeros_like(ca), -se, ce], axis=-1)

    def quad(u, v):
        return jnp.sum(u[..., :, None] * S * v[..., None, :], axis=(-2, -1))

    # B = H^T S H restricted to the (h2, h3) plane
    b22 = quad(h2, h2)
    b23 = quad(h2, h3)
    b33 = quad(h3, h3)

    # 2x2 symmetric eigen: major axis at half-angle psi. For an ISOTROPIC
    # box (fov_x == fov_y — e.g. decodes clamped to 180x180) the 2x2
    # moment is degenerate: both atan2 args underflow to ~0 and
    # atan2(0, 0) has a NaN gradient. Whether they round to exactly zero
    # depends on XLA fusion (the bug reproduced batched but not
    # standalone). psi is arbitrary there (beta ~ 0 makes the frame
    # irrelevant), so pin it to 0 with the double-where pattern that
    # keeps NaN out of the untaken branch's gradient.
    num = 2.0 * b23
    den = b22 - b33
    degenerate = (jnp.abs(num) + jnp.abs(den)) < 1e-10
    psi = jnp.where(
        degenerate, 0.0,
        0.5 * jnp.arctan2(jnp.where(degenerate, 0.0, num),
                          jnp.where(degenerate, 1.0, den)))
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    # gamma2/3 = H @ (0, cos psi, sin psi) / (0, -sin psi, cos psi)
    g2 = cp[..., None] * h2 + sp[..., None] * h3
    g3 = -sp[..., None] * h2 + cp[..., None] * h3

    r2 = quad(g2, g2) - quad(g3, g3)
    return r1, r2, alpha, psi, eta


def deg2kent(boxes_deg: jax.Array, img_size=None) -> jax.Array:
    """BFoV degrees (..., 4) -> Kent params (..., 5) (kappa, beta, alpha,
    psi, eta) by moment estimation. ``img_size`` accepted for reference API
    compatibility; the projection is resolution-independent.
    """
    del img_size
    boxes_rad = jnp.deg2rad(jnp.asarray(boxes_deg, jnp.float32)[..., :5])
    r1, r2, alpha, psi, eta = _kent_moments(boxes_rad)

    denom_m = jnp.maximum(2.0 - 2.0 * r1 - r2, 1e-6)
    denom_p = jnp.maximum(2.0 - 2.0 * r1 + r2, 1e-6)
    kappa = jnp.maximum(MIN_KAPPA, 1.0 / denom_m + 1.0 / denom_p)
    beta = 0.5 * (1.0 / denom_m - 1.0 / denom_p)

    return jnp.stack([kappa, beta, alpha, psi, eta], axis=-1)


def kent_mle(boxes_deg: jax.Array, iters: int = 25) -> jax.Array:
    """BFoV degrees (..., 4) -> Kent params (..., 5) by maximum likelihood.

    Device-friendly counterpart of the reference's scipy ``fmin_bfgs`` MLE
    (kent_formator.py:527 kent_mle) — never on the main path there or here,
    but part of the capability surface. With the moment frame fixed, the
    asymptotic normalizer log c = log 2pi + kappa - 0.5 log(kappa^2-4beta^2)
    (the reference's c_approximation, kent_iou_calculator.py:31) turns the
    score equations into

        d log c / d kappa = 1 - kappa/d = r1,     d = kappa^2 - 4 beta^2
        d log c / d beta  = 4 beta / d  = r2,

    solved by a fixed-iteration 2x2 Newton from the moment estimate —
    closed-form Jacobian, fully batched, jit/grad-compatible (no host
    loop, no scipy).
    """
    boxes_rad = jnp.deg2rad(jnp.asarray(boxes_deg, jnp.float32)[..., :5])
    r1, r2, alpha, psi, eta = _kent_moments(boxes_rad)

    # moment-estimate init
    denom_m = jnp.maximum(2.0 - 2.0 * r1 - r2, 1e-6)
    denom_p = jnp.maximum(2.0 - 2.0 * r1 + r2, 1e-6)
    kappa = jnp.maximum(MIN_KAPPA, 1.0 / denom_m + 1.0 / denom_p)
    beta = 0.5 * (1.0 / denom_m - 1.0 / denom_p)

    def newton(_, kb):
        k, b = kb
        d = jnp.maximum(k * k - 4.0 * b * b, 1e-6)
        f1 = 1.0 - k / d - r1
        f2 = 4.0 * b / d - r2
        j11 = (k * k + 4.0 * b * b) / (d * d)       # dF1/dk
        j12 = -8.0 * k * b / (d * d)                # dF1/db
        j21 = j12                                   # dF2/dk (symmetric)
        j22 = (4.0 * k * k + 16.0 * b * b) / (d * d)
        det = jnp.where(jnp.abs(j11 * j22 - j12 * j21) < 1e-12, 1e-12,
                        j11 * j22 - j12 * j21)
        dk = (j22 * f1 - j12 * f2) / det
        db = (j11 * f2 - j21 * f1) / det
        k = jnp.maximum(k - dk, MIN_KAPPA)
        b = jnp.clip(b - db, 0.0, (k - 1e-3) / 2.0)  # kappa > 2 beta
        return k, b

    kappa, beta = jax.lax.fori_loop(0, iters, newton, (kappa, beta))
    return jnp.stack([kappa, beta, alpha, psi, eta], axis=-1)


# --------------------------------------------------------------------------- #
# KLD between Kent distributions
# --------------------------------------------------------------------------- #
def _normalizer_ratios(kappa, beta):
    """Analytic (c_k/c, c_kk/c, c_beta/c) — ratio forms of
    kent_iou_calculator.py:31-47, overflow-free."""
    d = jnp.maximum(kappa * kappa - 4.0 * beta * beta, 1e-6)
    ck_c = (kappa * kappa - kappa - 4.0 * beta * beta) / d
    ckk_c = (
        kappa**4 - 2.0 * kappa**3 + (2.0 - 8.0 * beta * beta) * kappa * kappa
        + 8.0 * beta * beta * kappa + 16.0 * beta**4 + 4.0 * beta * beta
    ) / (d * d)
    cb_c = 4.0 * beta / d
    return ck_c, ckk_c, cb_c


def kent_kld(kent_a: jax.Array, kent_b: jax.Array) -> jax.Array:
    """KL(a || b) elementwise over (..., 5) canonical Kent params."""
    ka, ba = kent_a[..., 0], kent_a[..., 1]
    kb, bb = kent_b[..., 0], kent_b[..., 1]
    ga1, ga2, ga3 = kent_angles_to_gammas(
        kent_a[..., 2], kent_a[..., 3], kent_a[..., 4])
    gb1, gb2, gb3 = kent_angles_to_gammas(
        kent_b[..., 2], kent_b[..., 3], kent_b[..., 4])

    ck_c, ckk_c, cb_c = _normalizer_ratios(ka, ba)
    lam1 = ck_c
    lam2 = (1.0 - ckk_c + cb_c) / 2.0
    lam3 = (1.0 - ckk_c - cb_c) / 2.0

    # log(c_b / c_a), computed in log space
    da = jnp.maximum(ka * ka - 4.0 * ba * ba, 1e-6)
    db = jnp.maximum(kb * kb - 4.0 * bb * bb, 1e-6)
    log_term = (kb - ka) - 0.5 * (jnp.log(db) - jnp.log(da))

    # E[x]_a = (c_k/c) gamma_a1 ;  (kappa_a g_a1 - kappa_b g_b1) . E[x]_a
    ex = lam1[..., None] * ga1
    kappa_term = jnp.sum((ka[..., None] * ga1 - kb[..., None] * gb1) * ex, axis=-1)

    # v^T ExxT v with ExxT = sum_i lam_i g_ai g_ai^T
    def quad_exxt(v):
        return (
            lam1 * jnp.sum(v * ga1, axis=-1) ** 2
            + lam2 * jnp.sum(v * ga2, axis=-1) ** 2
            + lam3 * jnp.sum(v * ga3, axis=-1) ** 2
        )

    beta_terms = (
        ba * quad_exxt(ga2) - bb * quad_exxt(gb2)
        - ba * quad_exxt(ga3) + bb * quad_exxt(gb3)
    )
    return log_term + kappa_term + beta_terms


def kent_iou_from_params(kent_a, kent_b):
    # the floor keeps sqrt off 0, where its gradient is infinite (identical
    # pairs otherwise NaN the backward pass); value shift < 1e-6
    kld = jnp.maximum(kent_kld(kent_a, kent_b), 1e-12)
    return 1.0 / (1.0 + jnp.sqrt(kld))


def kent_iou_elementwise(boxes1_deg: jax.Array, boxes2_deg: jax.Array):
    """IoU surrogate 1/(1 + sqrt(KLD)) from BFoV degree boxes
    (sph_iou_api.py:202-219 semantics with the canonical layout)."""
    return kent_iou_from_params(deg2kent(boxes1_deg), deg2kent(boxes2_deg))


def kent_loss_terms(kent_a, kent_b, const: float = 2.0):
    """1 - 1/(const + sqrt(KLD)) (kent_iou_calculator.py:155-157).

    KLD floored at 1e-12, not 0: sqrt has an infinite gradient at 0 and
    identical pred/target rows (exact-fit positives, masked padding) are
    reachable in training."""
    kld = jnp.maximum(kent_kld(kent_a, kent_b), 1e-12)
    return 1.0 - 1.0 / (const + jnp.sqrt(kld))


def sph_kent_loss(pred, target, weight=None, *, const: float = 2.0,
                  reduction: str = "mean", avg_factor=None,
                  loss_weight: float = 1.0):
    """Kent KLD loss over spherical degree boxes (loss-registry entry).

    Zero-weight rows (padded/negative anchors in the positive-gather
    batch) are replaced by a benign box BEFORE deg2kent: `0 * nan = nan`,
    so masking the output would not stop a degenerate garbage row from
    poisoning the reduction (and `where` would still leak NaN through the
    gradient of the untaken branch)."""
    from ..losses.utils import reduce_box_weight, weight_reduce_loss

    weight = reduce_box_weight(weight)
    if weight is not None:
        safe = jnp.zeros_like(pred).at[..., :4].set(
            jnp.asarray([180.0, 90.0, 30.0, 30.0], pred.dtype))
        live = (weight > 0)[..., None]
        pred = jnp.where(live, pred, safe)
        target = jnp.where(live, target, safe)
    loss = kent_loss_terms(deg2kent(pred), deg2kent(target), const)
    return loss_weight * weight_reduce_loss(loss, weight, reduction, avg_factor)
