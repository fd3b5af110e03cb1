"""FCOS and SSD detectors: forward, targets, loss, gradients, predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.models.fcos import (
    SphFCOS, fcos_config, fcos_loss, fcos_predict, fcos_targets,
)
from sph_retina_tpu.models.ssd import (
    SphSSD, ssd_config, ssd_loss, ssd_predict,
)

B, H, W = 2, 64, 128
MAX_GT, NC = 6, 5


def _gt():
    boxes = jnp.stack([
        jnp.asarray(generate_boxes(MAX_GT, 4, seed=i, fov_range=(20, 70)))
        for i in range(B)])
    labels = jnp.tile(jnp.arange(MAX_GT) % NC, (B, 1))
    mask = jnp.tile(jnp.arange(MAX_GT) < 4, (B, 1))
    return boxes, labels, mask


@pytest.fixture(scope="module")
def fcos_setup():
    cfg = fcos_config(NC, img_size=(H, W))
    model = SphFCOS(num_classes=NC, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    variables = model.init(rng, images)
    return cfg, model, variables, images


def test_fcos_forward_shapes(fcos_setup):
    cfg, model, variables, images = fcos_setup
    cls, reg, ctr = model.apply(variables, images)
    sizes = cfg.featmap_sizes()
    for (h, w), c, r, cn in zip(sizes, cls, reg, ctr):
        assert c.shape == (B, h * w, NC)
        assert r.shape == (B, h * w, 4)
        assert cn.shape == (B, h * w)
    assert (np.asarray(reg[0]) >= 0).all()  # exp-activated distances


def test_fcos_targets_assign_center(fcos_setup):
    cfg, *_ = fcos_setup
    # one big box centered at (theta=180, phi=90): its chart center point
    # must be positive with high centerness
    boxes = jnp.asarray([[[180.0, 90.0, 120.0, 120.0]]])
    labels = jnp.asarray([[2]])
    mask = jnp.asarray([[True]])
    t = fcos_targets(cfg, boxes, labels, mask)
    pos = np.asarray((t.labels[0] >= 0) & (t.labels[0] < NC))
    assert pos.sum() > 0
    ctr = np.asarray(t.centerness[0])
    assert ctr.max() > 0.6  # coarse grid: best point is off-center
    assert (np.asarray(t.labels[0])[pos] == 2).all()


def test_fcos_loss_and_grads(fcos_setup):
    cfg, model, variables, images = fcos_setup
    boxes, labels, mask = _gt()

    def f(params):
        cls, reg, ctr = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, images)
        losses = fcos_loss(cfg, cls, reg, ctr, boxes, labels, mask)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in losses.values())
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_fcos_predict(fcos_setup):
    cfg, model, variables, images = fcos_setup
    cls, reg, ctr = model.apply(variables, images)
    res = fcos_predict(cfg, cls, reg, ctr)
    assert res.boxes.shape == (B, cfg.max_per_img, 4)
    assert np.isfinite(np.asarray(res.boxes)).all()


@pytest.fixture(scope="module")
def ssd_setup():
    cfg = ssd_config(NC, img_size=(H, W))
    model = SphSSD(num_classes=NC, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    variables = model.init(rng, images)
    return cfg, model, variables, images


def test_ssd_forward_and_anchor_alignment(ssd_setup):
    cfg, model, variables, images = ssd_setup
    cls, reg = model.apply(variables, images)
    anchors = cfg.flat_anchors()
    total = sum(c.shape[1] for c in cls)
    assert anchors.shape == (total, 4)
    assert cls[0].shape[-1] == NC + 1  # softmax incl. background


def test_ssd_loss_and_grads(ssd_setup):
    cfg, model, variables, images = ssd_setup
    boxes, labels, mask = _gt()
    anchors = cfg.flat_anchors()

    def f(params):
        cls, reg = model.apply({"params": params}, images)
        losses = ssd_loss(cfg, cls, reg, anchors, boxes, labels, mask)
        return losses["loss_cls"] + losses["loss_bbox"], losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total)) and float(total) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_ssd_hard_negative_mining_counts():
    """Negative-selection mask must contain <= ratio * num_pos entries."""
    cfg = ssd_config(NC, img_size=(H, W))
    anchors = cfg.flat_anchors()
    n = anchors.shape[0]
    cls = [jnp.zeros((1, n, NC + 1))]
    reg = [jnp.zeros((1, n, 4))]
    boxes, labels, mask = _gt()
    losses = ssd_loss(cfg, cls, reg, anchors, boxes[:1], labels[:1], mask[:1])
    assert np.isfinite(float(losses["loss_cls"]))


def test_ssd_predict(ssd_setup):
    cfg, model, variables, images = ssd_setup
    cls, reg = model.apply(variables, images)
    res = ssd_predict(cfg, cls, reg)
    assert res.boxes.shape == (B, cfg.max_per_img, 4)
    assert np.isfinite(np.asarray(res.scores)).all()


def test_ssd_remat_identical_math():
    """remat=True (whole-VGG-trunk rematerialization) must not change the
    param tree or gradients, only the backward memory schedule."""
    from sph_retina_tpu.models import SphSSD

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 128, 3))
    m0 = SphSSD(num_classes=3, dtype=jnp.float32)
    m1 = SphSSD(num_classes=3, dtype=jnp.float32, remat=True)
    v0 = m0.init(jax.random.PRNGKey(1), x)
    v1 = m1.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))

    def s(m, p):
        cls, reg = m.apply({"params": p}, x)
        return (sum(jnp.sum(c.astype(jnp.float32) ** 2) for c in cls)
                + sum(jnp.sum(r.astype(jnp.float32) ** 2) for r in reg))

    g0 = jax.grad(lambda p: s(m0, p))(v0["params"])
    g1 = jax.grad(lambda p: s(m1, p))(v1["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_ssd_decoded_ciou_loss_and_grads(ssd_setup):
    """reg_decoded_bbox routes the regression loss through decoded boxes +
    cfg.loss_bbox (reference faster_rcnn_r50_fpn_ciou_1x_coco.py pattern);
    gradients must stay finite and differ from the smooth-L1 delta path."""
    import dataclasses

    from sph_retina_tpu.losses import build_loss

    cfg, model, variables, images = ssd_setup
    dcfg = dataclasses.replace(
        cfg, reg_decoded_bbox=True,
        loss_bbox=build_loss({"type": "Sph2PobIoULoss", "mode": "ciou"}))
    boxes, labels, mask = _gt()
    anchors = cfg.flat_anchors()

    def f(params, c):
        cls, reg = model.apply({"params": params}, images)
        losses = ssd_loss(c, cls, reg, anchors, boxes, labels, mask)
        return losses["loss_cls"] + losses["loss_bbox"], losses

    (tot_d, l_d), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"], dcfg)
    (_, l_sl1), _ = jax.value_and_grad(f, has_aux=True)(
        variables["params"], cfg)
    assert np.isfinite(float(tot_d))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    assert float(l_d["loss_bbox"]) != pytest.approx(
        float(l_sl1["loss_bbox"]))


def test_fcos_l1_loss_bbox_variant(fcos_setup):
    """An L1-family loss_bbox (the ap_study fcos 'l1' variant) must accept
    the (N, 1) centerness weight and produce finite grads."""
    import dataclasses

    from sph_retina_tpu.losses import build_loss

    cfg, model, variables, images = fcos_setup
    lcfg = dataclasses.replace(
        cfg, loss_bbox=build_loss({"type": "SphL1Loss", "loss_weight": 0.05}))
    boxes, labels, mask = _gt()

    def f(params):
        cls, reg, ctr = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images)
        losses = fcos_loss(lcfg, cls, reg, ctr, boxes, labels, mask)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
