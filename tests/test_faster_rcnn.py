"""Faster R-CNN: RPN, RoIAlign, sampling, two-stage loss and predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.models.faster_rcnn import (
    SphFasterRCNN,
    faster_rcnn_config,
    multilevel_roi_align,
    rcnn_loss,
    rcnn_predict,
    roi_align,
    roi_features,
    rpn_loss,
    rpn_proposals,
    sample_rois,
)

B, H, W = 2, 64, 128
MAX_GT, NC = 6, 5


def _gt():
    boxes = jnp.stack([
        jnp.asarray(generate_boxes(MAX_GT, 4, seed=i, fov_range=(50, 110)))
        for i in range(B)])
    labels = jnp.tile(jnp.arange(MAX_GT) % NC, (B, 1))
    mask = jnp.tile(jnp.arange(MAX_GT) < 4, (B, 1))
    return boxes, labels, mask


@pytest.fixture(scope="module")
def setup():
    cfg = faster_rcnn_config(NC, img_size=(H, W), num_proposals=64,
                             num_rois=32, rpn_nms_pre=200)
    model = SphFasterRCNN(num_classes=NC, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    variables = model.init(rng, images, method=SphFasterRCNN.init_all)
    return cfg, model, variables, images


def test_roi_align_constant_field():
    """RoIAlign over a constant feature must return that constant."""
    feat = jnp.full((16, 32, 8), 3.5)
    rois = jnp.asarray([[2.0, 2.0, 20.0, 10.0], [0.0, 0.0, 31.0, 15.0]])
    out = roi_align(feat, rois, out_size=7, spatial_scale=1.0)
    assert out.shape == (2, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_roi_align_gradient_field():
    """On a linear-in-x field, bin means must increase along x."""
    x = jnp.broadcast_to(jnp.arange(32.0)[None, :, None], (16, 32, 1))
    rois = jnp.asarray([[4.0, 4.0, 28.0, 12.0]])
    out = np.asarray(roi_align(x, rois, out_size=7))[0, :, :, 0]
    assert (np.diff(out.mean(axis=0)) > 0).all()
    # center bin value ~ roi center x
    assert abs(out[3, 3] - 16.0) < 2.0


def test_multilevel_select():
    feats = [jnp.full((2 ** (4 - l), 2 ** (5 - l), 4), float(l))
             for l in range(4)]
    # small roi -> level 0; huge roi -> level 3
    rois = jnp.asarray([[0.0, 0.0, 8.0, 8.0], [0.0, 0.0, 500.0, 500.0]])
    out = np.asarray(multilevel_roi_align(feats, rois, strides=(4, 8, 16, 32)))
    assert out[0].mean() == pytest.approx(0.0)
    assert out[1].mean() == pytest.approx(3.0)


def test_rpn_and_proposals(setup):
    cfg, model, variables, images = setup
    (rpn_out, feats) = model.apply(variables, images)
    rpn_cls, rpn_reg = rpn_out
    assert len(rpn_cls) == 5
    losses = rpn_loss(cfg, rpn_cls, rpn_reg, _gt()[0], _gt()[2])
    assert np.isfinite(float(losses["loss_rpn_cls"]))
    boxes, scores, valid = rpn_proposals(cfg, rpn_cls, rpn_reg)
    assert boxes.shape == (B, cfg.num_proposals, 4)
    assert bool(valid.any())


def test_two_stage_loss_and_grads(setup):
    cfg, model, variables, images = setup
    gt_boxes, gt_labels, gt_mask = _gt()
    rng = jax.random.PRNGKey(1)

    def f(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        (rpn_cls, rpn_reg), feats = model.apply(v, images)
        losses = rpn_loss(cfg, rpn_cls, rpn_reg, gt_boxes, gt_mask)
        props, _, pvalid = rpn_proposals(cfg, rpn_cls, rpn_reg)
        t = sample_rois(cfg, rng, jax.lax.stop_gradient(props), pvalid,
                        gt_boxes, gt_labels, gt_mask)
        rf = roi_features(cfg, feats, t.rois)
        cls, reg = model.apply(v, rf.reshape(-1, 7, 7, rf.shape[-1]),
                               method=SphFasterRCNN.roi)
        losses.update(rcnn_loss(cfg, cls, reg, t))
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                           "loss_bbox"}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # both stages must receive gradient
    assert float(jnp.abs(grads["rpn_head"]["rpn_reg"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["bbox_head"]["fc_cls"]["kernel"]).sum()) > 0


def test_sample_rois_includes_gt(setup):
    cfg, *_ = setup
    gt_boxes, gt_labels, gt_mask = _gt()
    props = jnp.asarray(np.ones((B, cfg.num_proposals, 4), np.float32))
    pvalid = jnp.zeros((B, cfg.num_proposals), bool)  # no rpn proposals
    t = sample_rois(cfg, jax.random.PRNGKey(0), props, pvalid,
                    gt_boxes, gt_labels, gt_mask)
    # gts are appended as candidates, so positives must exist
    assert int(t.pos_mask.sum()) > 0
    # positive rois carry the gt label
    pos = np.asarray(t.pos_mask[0])
    lab = np.asarray(t.labels[0])
    assert (lab[pos] < NC).all()


def test_rcnn_predict(setup):
    cfg, model, variables, images = setup
    (rpn_cls, rpn_reg), feats = model.apply(variables, images)
    props, _, pvalid = rpn_proposals(cfg, rpn_cls, rpn_reg)
    rf = roi_features(cfg, feats, props)
    cls, reg = model.apply(variables, rf.reshape(-1, 7, 7, rf.shape[-1]),
                           method=SphFasterRCNN.roi)
    p = cfg.num_proposals
    res = rcnn_predict(cfg, cls.reshape(B, p, -1), reg.reshape(B, p, -1),
                       props, pvalid)
    assert res.boxes.shape == (B, cfg.max_per_img, 4)
    assert np.isfinite(np.asarray(res.scores)).all()


def test_ohem_sampling_picks_hardest(setup):
    """hardness_fn-ranked sampling keeps the highest-loss candidates
    (OHEMSampler.hard_mining semantics)."""
    cfg, *_ = setup
    gt_boxes, gt_labels, gt_mask = _gt()
    props = jnp.asarray(np.ones((B, cfg.num_proposals, 4), np.float32))
    pvalid = jnp.zeros((B, cfg.num_proposals), bool)  # gts are the only pos

    k = cfg.num_proposals + MAX_GT
    hard = jnp.tile(jnp.arange(k, dtype=jnp.float32), (B, 1))

    seen = {}
    for seed in (0, 1):
        t = sample_rois(cfg, jax.random.PRNGKey(seed), props, pvalid,
                        gt_boxes, gt_labels, gt_mask,
                        hardness_fn=lambda cand, labels: hard)
        seen[seed] = np.asarray(t.rois)
    # deterministic: the rng must not influence hardness-ranked picks
    np.testing.assert_array_equal(seen[0], seen[1])
    # the positives picked are the valid gts with the highest hardness —
    # gt index 3 (hardness k-3) must be among the sampled positive rois
    pos = np.asarray(t.pos_mask[0])
    pos_rois = np.asarray(t.rois[0])[pos]
    want = np.asarray(gt_boxes[0, 3])
    assert any(np.allclose(r, want) for r in pos_rois)


def test_ohem_train_step_via_family():
    """train_cfg sampler OHEMSampler reaches the family loss and trains."""
    from sph_retina_tpu.engine.zoo import get_family

    cfg_dict = {
        "model": {"type": "SphFasterRCNN", "num_classes": NC,
                  "backbone": {"depth": 18}},
        "img_size": (H, W), "bf16": False,
        "train_cfg": {"sampler": {"type": "OHEMSampler"}},
    }
    family = get_family(cfg_dict)
    model, cfg = family.build(cfg_dict)
    assert cfg.sampler_type == "ohem"
    variables = family.init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 3)))
    gt_boxes, gt_labels, gt_mask = _gt()
    batch = {"images": jnp.zeros((B, H, W, 3)), "gt_boxes": gt_boxes,
             "gt_labels": gt_labels, "gt_mask": gt_mask}
    loss_fn = family.loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(
        lambda v: loss_fn(v, batch, jax.random.PRNGKey(1))[0])
    total, grads = grad_fn(variables)
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_rcnn_decoded_ciou_loss(setup):
    """reg_decoded_bbox + IoU-family loss_bbox on the RoI head (reference
    faster_rcnn_r50_fpn_ciou_1x_coco.py:5-6 pattern): perfect deltas give
    ~zero regression loss, random deltas give a clearly positive one."""
    import dataclasses

    from sph_retina_tpu.losses import build_loss

    cfg, model, variables, images = setup
    dcfg = dataclasses.replace(
        cfg, reg_decoded_bbox=True,
        loss_bbox=build_loss({"type": "Sph2PobIoULoss", "mode": "ciou"}))
    gt_boxes, gt_labels, gt_mask = _gt()
    (rpn_cls, rpn_reg), feats = model.apply(variables, images)
    props, _, pvalid = rpn_proposals(cfg, rpn_cls, rpn_reg)
    t = sample_rois(cfg, jax.random.PRNGKey(0), props, pvalid,
                    gt_boxes, gt_labels, gt_mask)
    b, r = t.labels.shape
    d = t.rois.shape[-1]
    ncls = cfg.num_classes + 1
    logits = jnp.zeros((b * r, ncls))

    perfect = rcnn_loss(dcfg, logits, t.reg_targets.reshape(-1, d), t)
    noisy = rcnn_loss(
        dcfg, logits,
        t.reg_targets.reshape(-1, d)
        + jax.random.normal(jax.random.PRNGKey(1), (b * r, d)), t)
    assert float(perfect["loss_bbox"]) < 0.05
    assert float(noisy["loss_bbox"]) > float(perfect["loss_bbox"]) + 0.05

    # gradient flows through the decoded path
    g = jax.grad(lambda rp: rcnn_loss(dcfg, logits, rp, t)["loss_bbox"])(
        t.reg_targets.reshape(-1, d) + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
