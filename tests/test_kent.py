"""Kent distribution subsystem: moment estimation, KLD, IoU surrogate.

Golden values generated from the reference implementations
(kent_formator.deg2kent + kent_iou_calculator.get_kld, fp64, with its
star-import `max` shadowing patched) on the fixed boxes below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.iou import sph_overlaps
from sph_retina_tpu.iou.kent import (
    deg2kent,
    kent_angles_to_gammas,
    kent_iou_elementwise,
    kent_kld,
    sph_kent_loss,
)

BOXES = jnp.asarray(generate_boxes(16, 4, seed=1, fov_range=(10, 80)))


def test_deg2kent_shapes_and_validity():
    k = np.asarray(deg2kent(BOXES))
    assert k.shape == (16, 5)
    kappa, beta = k[:, 0], k[:, 1]
    assert (kappa > 0).all()
    assert (beta >= -1e-5).all()
    # Kent validity: 2 beta < kappa
    assert (2 * beta < kappa + 1e-3).all()


def test_gamma_frame_orthonormal():
    k = deg2kent(BOXES)
    g1, g2, g3 = kent_angles_to_gammas(k[..., 2], k[..., 3], k[..., 4])
    for g in (g1, g2, g3):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(g), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(g1 * g2), -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(g2 * g3), -1), 0.0, atol=1e-5)


def test_gamma1_points_at_box_center():
    """Mean direction of the fitted Kent must be the box center (in the
    Kent x-pole convention: gamma1 = (cos a, sin a cos e, sin a sin e) with
    the sampling's sign permutation)."""
    box = jnp.asarray([[90.0, 90.0, 30.0, 30.0]])  # center on the equator
    k = deg2kent(box)
    g1 = np.asarray(kent_angles_to_gammas(k[..., 2], k[..., 3], k[..., 4])[0])[0]
    # center (theta=90, phi=90): lon=-pi/2, lat=0 -> sample mean along
    # (-p_y, -p_z, -p_x) of Ry(lon)Rx(lat) (0,0,1) = (0, -cos(lon), ... )
    # numerically: direction must be a unit vector with |g1 . g1_expected|~1
    box2 = jnp.asarray([[90.0, 90.0, 29.0, 31.0]])
    k2 = deg2kent(box2)
    g1b = np.asarray(kent_angles_to_gammas(k2[..., 2], k2[..., 3], k2[..., 4])[0])[0]
    assert abs(np.dot(g1, g1b)) > 0.9999  # same center -> same mean direction


def test_kld_identity_zero_and_asymmetric():
    k = deg2kent(BOXES)
    kld_self = np.asarray(kent_kld(k, k))
    np.testing.assert_allclose(kld_self, 0.0, atol=1e-3)
    k2 = deg2kent(jnp.asarray(generate_boxes(16, 4, seed=2, fov_range=(10, 80))))
    ab = np.asarray(kent_kld(k, k2))
    assert (ab > -1e-3).all()


def test_kent_golden_kld():
    """Reference fp64 KLD for boxes[i] vs boxes[i-1] (first three)."""
    k = deg2kent(BOXES)
    kb = jnp.roll(k, 1, axis=0)
    kld = np.asarray(kent_kld(k, kb))
    np.testing.assert_allclose(kld[:3], [0.746, 64.57, 4.781], rtol=0.02)


def test_kent_iou_backend():
    iou_self = np.asarray(kent_iou_elementwise(BOXES, BOXES))
    assert (iou_self > 0.95).all()
    via_api = np.asarray(sph_overlaps(BOXES, BOXES, "kent", is_aligned=True))
    assert (via_api > 0.9).all()
    pair = sph_overlaps(BOXES[:4], BOXES[:6], "kent")
    assert pair.shape == (4, 6)


def test_kent_loss_gradients():
    pred = jnp.asarray(generate_boxes(8, 4, seed=3, fov_range=(10, 80)))
    tgt = jnp.asarray(generate_boxes(8, 4, seed=4, fov_range=(10, 80)))

    def f(p):
        return sph_kent_loss(p, tgt)

    val = float(f(pred))
    g = jax.grad(f)(pred)
    assert np.isfinite(val) and val > 0
    assert np.isfinite(np.asarray(g)).all()
    assert float(f(pred)) > float(f(tgt + 0.0) * 0 + sph_kent_loss(tgt, tgt))


def test_kent_large_kappa_no_overflow():
    """Tiny boxes -> huge kappa; the log-space ratios must stay finite
    (the reference's c_approximation overflows fp32 here)."""
    tiny = jnp.asarray([[100.0, 90.0, 1.5, 1.5], [101.0, 90.0, 1.5, 1.5]])
    k = deg2kent(tiny)
    assert np.isfinite(np.asarray(k)).all()
    assert float(k[0, 0]) > 500.0  # genuinely large kappa
    kld = np.asarray(kent_kld(k[:1], k[1:]))
    assert np.isfinite(kld).all()


def test_kent_mle_satisfies_score_equations():
    """MLE (kappa, beta) must zero the asymptotic-normalizer score
    equations 1 - kappa/d = r1, 4 beta/d = r2 (reference kent_mle via
    fmin_bfgs, kent_formator.py:527; here fixed-iteration Newton)."""
    from sph_retina_tpu.iou.kent import _kent_moments, kent_mle

    boxes = jnp.asarray(generate_boxes(32, 4, seed=5, fov_range=(10.0, 80.0)))
    params = kent_mle(boxes)
    k, b = np.asarray(params[:, 0]), np.asarray(params[:, 1])
    r1, r2, *_ = (np.asarray(m) for m in
                  _kent_moments(jnp.deg2rad(boxes)))
    d = k * k - 4.0 * b * b
    np.testing.assert_allclose(1.0 - k / d, r1, atol=5e-4)
    np.testing.assert_allclose(4.0 * b / d, r2, atol=5e-4)
    assert (k > 2.0 * b - 1e-5).all()


def test_kent_mle_close_to_moment_estimate():
    """The Newton MLE refines rather than contradicts the moment estimator
    (same frame, kappa/beta within a modest relative distance)."""
    from sph_retina_tpu.iou.kent import kent_mle

    boxes = jnp.asarray(generate_boxes(16, 4, seed=9, fov_range=(15.0, 60.0)))
    me = np.asarray(deg2kent(boxes))
    mle = np.asarray(kent_mle(boxes))
    np.testing.assert_allclose(mle[:, 2:], me[:, 2:], atol=1e-6)  # frame fixed
    ratio = mle[:, 0] / me[:, 0]
    assert (ratio > 0.5).all() and (ratio < 2.0).all()
    assert np.isfinite(mle).all()


def test_kent_grid_anchors_parity():
    """KentAnchorGenerator counterpart: per-level Kent-space anchors."""
    from sph_retina_tpu.boxes.anchors import SphAnchorGenerator, kent_grid_anchors

    gen = SphAnchorGenerator(strides=[8, 16], ratios=[1.0],
                             octave_base_scale=4, scales_per_octave=1)
    sizes = [(8, 16), (4, 8)]
    kents = kent_grid_anchors(gen, sizes)
    sph = gen.grid_anchors(sizes)
    for kp, sp in zip(kents, sph):
        assert kp.shape == (sp.shape[0], 5)
        assert np.isfinite(np.asarray(kp)).all()
        assert (np.asarray(kp[:, 0]) > 0).all()  # kappa positive


def test_kent_backend_sees_rbfov_rotation():
    """deg2kent must honor RBFoV gamma (the reference's kent pipeline
    silently drops it: sampleFromAnnotation_deg is 4-dof only, so its kent
    IoU/loss is rotation-blind). The tangent grid rolls about the boresight:
    kappa/beta are rotation-invariant, the major axis turns with gamma, and
    kent IoU decreases monotonically with relative rotation."""
    base = np.array([120.0, 70.0, 60.0, 20.0])

    def box(g):
        return jnp.asarray(np.concatenate([base, [g]])[None])

    p0 = np.asarray(deg2kent(box(0.0)))[0]
    p45 = np.asarray(deg2kent(box(45.0)))[0]
    np.testing.assert_allclose(p0[:2], p45[:2], rtol=1e-4)  # kappa, beta
    assert abs(p0[2] - p45[2]) < 1e-4  # mean direction unchanged

    vals = [
        float(sph_overlaps(box(0.0), box(g), "kent", is_aligned=True)[0])
        for g in (0.0, 15.0, 30.0, 60.0, 90.0)
    ]
    assert vals[0] > 0.999  # same box
    assert all(a > b for a, b in zip(vals, vals[1:]))  # strictly decreasing
    assert vals[-1] < 0.5
    # equal rotation on both sides is still the identical pair
    same = float(sph_overlaps(box(45.0), box(45.0), "kent", is_aligned=True)[0])
    assert same > 0.999


def test_kent_loss_degenerate_boxes_finite_grads():
    """Coder-decoded boxes can land exactly on the 180-deg fov clamp and
    positive-gather batches carry zero-weight garbage rows; both used to
    NaN the backward pass (tan pole in the tangent grid at fov=pi,
    0*nan through the weighted reduction, sqrt'(0) at KLD=0). The round-4
    guards keep loss AND gradients finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.iou.kent import sph_kent_loss

    pred = jnp.asarray([
        [180.0, 90.0, 180.0, 180.0],   # fov at the clamp boundary
        [10.0, 1.0, 0.0, 0.0],         # degenerate zero-fov
        [350.0, 179.0, 30.0, 40.0],    # normal
        [90.0, 90.0, 20.0, 20.0],      # identical to target (KLD=0)
    ])
    target = jnp.asarray([
        [182.0, 88.0, 40.0, 40.0],
        [12.0, 2.0, 25.0, 25.0],
        [351.0, 178.0, 32.0, 38.0],
        [90.0, 90.0, 20.0, 20.0],
    ])
    # last row zero-weighted: it must not poison the reduction either way
    w = jnp.asarray([1.0, 0.0, 1.0, 1.0])

    val, grad = jax.value_and_grad(
        lambda p: sph_kent_loss(p, target, w, avg_factor=3.0))(pred)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    # zero-weight row contributes no gradient
    assert float(jnp.abs(grad[1]).sum()) == 0.0


def test_kent_loss_pole_and_isotropic_finite_grads():
    """The two round-5 NaN sources of the gradient-through-KLD config
    (diverged at step 1 at study settings until fixed):

    1. decodes clamped to phi = 0/180 put the Kent mean direction exactly
       on the ERP pole, where arccos'(+-1) is infinite and
       eta = atan2(0, 0) — guarded by the latitude clamp in
       _sample_box_points;
    2. ISOTROPIC boxes (fov_x == fov_y, e.g. 180x180 clamps) degenerate
       the 2x2 moment eigenproblem: psi = 0.5*atan2(~0, ~0), whose NaN
       gradient appears or not depending on XLA fusion rounding (batched
       vs standalone differed) — guarded by the double-where psi pin.

    Both must stay finite through value AND grad, in one batch (fusion
    matters — do not split this into per-row checks).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.iou.kent import sph_kent_loss

    pred = jnp.asarray([
        [154.33, 0.0, 92.958, 139.925],    # pole-clamped center
        [100.315, 180.0, 180.0, 180.0],    # pole + isotropic clamp
        [227.346, 39.285, 180.0, 180.0],   # isotropic 180x180 (bug row)
        [90.0, 90.0, 30.0, 30.0],          # isotropic, healthy
        [5.95, 0.493, 41.134, 69.042],     # near-pole, healthy
    ])
    target = jnp.asarray([
        [5.95, 0.493, 41.134, 69.042],
        [100.0, 120.0, 40.0, 30.0],
        [229.306, 97.852, 63.159, 50.769],
        [91.0, 91.0, 28.0, 33.0],
        [6.0, 1.0, 40.0, 70.0],
    ])
    w = jnp.ones((5,))
    val, grad = jax.value_and_grad(
        lambda p: sph_kent_loss(p, target, w, avg_factor=5.0))(pred)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    # and in the reverse KLD direction (target || pred)
    val2, grad2 = jax.value_and_grad(
        lambda p: sph_kent_loss(target, p, w, avg_factor=5.0))(pred)
    assert np.isfinite(float(val2))
    assert np.isfinite(np.asarray(grad2)).all()
