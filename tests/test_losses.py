"""Loss family tests: values at identity, gradient direction, reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.losses import (
    build_loss,
    gwd_terms,
    kfiou_terms,
    kld_terms,
    obb_iou_loss_terms,
    sigmoid_focal_loss,
    cross_entropy_loss,
    sph2pob_iou_loss,
    sph2pob_kf_loss,
    sph2pob_kld_loss,
    sph2pob_gwd_loss,
    sph2pob_l1_loss,
    sph_l1_loss,
    weight_reduce_loss,
)

PRED = jnp.asarray(generate_boxes(32, 4, seed=1))
TARGET = jnp.asarray(generate_boxes(32, 4, seed=2))


@pytest.mark.parametrize("mode", ["iou", "giou", "diou", "ciou"])
def test_obb_iou_loss_identity_and_range(mode):
    # note: giou's enclosure is the axis-aligned cover of the rotated boxes
    # (reference obb_iou_loss:142-147), so its identity value is only zero
    # for axis-aligned boxes.
    angle = 0.0 if mode == "giou" else 0.3
    boxes = jnp.array([[0.0, 0.0, 1.0, 0.6, angle], [1.0, -0.5, 0.8, 0.8, -angle]])
    loss = np.asarray(obb_iou_loss_terms(boxes, boxes, mode))
    np.testing.assert_allclose(loss, 0.0, atol=1e-4)
    other = boxes + jnp.array([[2.0, 2.0, 0.0, 0.0, 0.0]])
    loss2 = np.asarray(obb_iou_loss_terms(boxes, other, mode))
    assert (loss2 > 0.9).all()  # disjoint: iou term saturates


@pytest.mark.parametrize(
    "loss_fn",
    [sph2pob_iou_loss, sph2pob_l1_loss, sph2pob_gwd_loss, sph2pob_kld_loss,
     sph2pob_kf_loss],
)
def test_sph_losses_gradients_and_direction(loss_fn):
    def f(p):
        return loss_fn(p, TARGET, reduction="mean")

    val = float(f(PRED))
    g = jax.grad(f)(PRED)
    assert np.isfinite(val)
    assert np.isfinite(np.asarray(g)).all()
    # one gradient step must reduce the loss
    step = PRED - 1.0 * g / (jnp.abs(g).max() + 1e-8)
    assert float(f(step)) < val


def test_identical_boxes_small_loss():
    for fn in (sph2pob_iou_loss, sph2pob_kld_loss):
        val = float(fn(PRED, PRED, reduction="mean"))
        assert val < 0.1, fn


def test_gaussian_terms_zero_at_identity():
    boxes = jnp.array([[0.0, 0.0, 1.0, 0.6, 0.3]])
    assert float(gwd_terms(boxes, boxes)[0]) < 1e-3
    assert float(kld_terms(boxes, boxes)[0]) < 1e-3
    assert float(kfiou_terms(boxes, boxes)[0]) < 1e-2


def test_weight_reduce_semantics():
    loss = jnp.array([1.0, 2.0, 3.0, 4.0])
    w = jnp.array([1.0, 1.0, 0.0, 0.0])
    assert float(weight_reduce_loss(loss, w, "mean")) == pytest.approx(1.5)
    assert float(weight_reduce_loss(loss, w, "mean", avg_factor=4.0)) == pytest.approx(0.75)
    assert float(weight_reduce_loss(loss, None, "sum")) == pytest.approx(10.0)
    out = weight_reduce_loss(loss, w, "none")
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 0.0, 0.0])


def test_focal_loss_properties():
    logits = jnp.array([[2.0, -1.0, 0.5], [-2.0, 3.0, 0.0]])
    labels = jnp.array([0, 3])  # class 0; background (== num_classes)
    # gamma=0, alpha=0.5 reduces to 0.5 * BCE
    loss = sigmoid_focal_loss(logits, labels, gamma=0.0, alpha=0.5,
                              reduction="none")
    p = jax.nn.sigmoid(logits)
    t = jax.nn.one_hot(labels, 3)
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    np.testing.assert_allclose(np.asarray(loss), 0.5 * np.asarray(bce), atol=1e-5)
    # confident correct prediction -> tiny focal loss
    strong = jnp.array([[8.0, -8.0, -8.0]])
    val = float(sigmoid_focal_loss(strong, jnp.array([0]), reduction="sum"))
    assert val < 1e-2


def test_cross_entropy_matches_manual():
    logits = jnp.array([[1.0, 2.0, 0.0], [0.1, 0.1, 3.0]])
    labels = jnp.array([1, 2])
    got = np.asarray(cross_entropy_loss(logits, labels, reduction="none"))
    expect = -np.asarray(jax.nn.log_softmax(logits))[np.arange(2), [1, 2]]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_build_loss_from_config():
    cfg = dict(type="Sph2PobIoULoss", mode="ciou", loss_weight=2.0)
    fn = build_loss(cfg)
    v = float(fn(PRED, TARGET, reduction="mean"))
    assert np.isfinite(v) and v > 0
    fn2 = build_loss(dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0))
    assert np.isfinite(float(fn2(jnp.zeros((4, 3)), jnp.array([0, 1, 2, 3]))))
    fn3 = build_loss(dict(type="Sph2PobGDLoss", loss_type="kld", tau=1.0))
    assert np.isfinite(float(fn3(PRED, TARGET)))


def test_rbfov_losses():
    p5 = jnp.asarray(generate_boxes(16, 5, seed=3))
    t5 = jnp.asarray(generate_boxes(16, 5, seed=4))
    for fn in (sph2pob_iou_loss, sph2pob_l1_loss, sph2pob_gwd_loss):
        v = float(fn(p5, t5))
        assert np.isfinite(v)
        g = jax.grad(lambda p: fn(p, t5))(p5)
        assert np.isfinite(np.asarray(g)).all()


def test_l1_weight_padding_bfov():
    w = jnp.ones((32, 4))
    v = float(sph2pob_l1_loss(PRED, TARGET, w))
    assert np.isfinite(v)
    v0 = float(sph_l1_loss(PRED, PRED, jnp.ones((32, 4))))
    assert v0 == 0.0
