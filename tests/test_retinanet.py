"""End-to-end RetinaNet: forward, loss, gradients, predict (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.losses import sph2pob_iou_loss
from sph_retina_tpu.models import SphRetinaNet
from sph_retina_tpu.models.single_stage import (
    retina_config,
    retina_loss,
    retina_predict,
)

B, H, W = 2, 64, 128
MAX_GT = 8
NUM_CLASSES = 7


@pytest.fixture(scope="module")
def setup():
    cfg = retina_config(NUM_CLASSES, img_size=(H, W))
    model = SphRetinaNet(num_classes=NUM_CLASSES, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    variables = model.init(rng, images)
    return cfg, model, variables, images


def _gt_batch():
    boxes = jnp.stack([
        jnp.asarray(generate_boxes(MAX_GT, 4, seed=i)) for i in range(B)
    ])
    labels = jnp.tile(jnp.arange(MAX_GT) % NUM_CLASSES, (B, 1))
    mask = jnp.tile(jnp.arange(MAX_GT) < 5, (B, 1))
    return boxes, labels, mask


def test_forward_shapes(setup):
    cfg, model, variables, images = setup
    cls_scores, bbox_preds = model.apply(variables, images)
    sizes = cfg.featmap_sizes()
    assert len(cls_scores) == 5
    for (h, w), cs, bp in zip(sizes, cls_scores, bbox_preds):
        assert cs.shape == (B, h * w * 9, NUM_CLASSES)
        assert bp.shape == (B, h * w * 9, 4)
    total = sum(h * w * 9 for h, w in sizes)
    assert cfg.flat_anchors().shape == (total, 4)


def test_loss_and_gradients(setup):
    cfg, model, variables, images = setup
    boxes, labels, mask = _gt_batch()
    anchors = cfg.flat_anchors()

    def loss_fn(params):
        cls_scores, bbox_preds = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, images)
        losses = retina_loss(cfg, cls_scores, bbox_preds, anchors,
                             boxes, labels, mask)
        return losses["loss_cls"] + losses["loss_bbox"], losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert float(losses["loss_cls"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the head's reg conv must receive gradient
    g_reg = grads["bbox_head"]["retina_reg"]["kernel"]
    assert float(jnp.abs(g_reg).sum()) > 0


def test_loss_with_iou_loss_decoded(setup):
    cfg0, model, variables, images = setup
    cfg = retina_config(NUM_CLASSES, img_size=(H, W),
                        loss_bbox=lambda *a, **k: sph2pob_iou_loss(
                            *a, mode="ciou", **k),
                        reg_decoded_bbox=True)
    boxes, labels, mask = _gt_batch()
    cls_scores, bbox_preds = model.apply(variables, images)
    losses = retina_loss(cfg, cls_scores, bbox_preds, cfg.flat_anchors(),
                         boxes, labels, mask)
    assert np.isfinite(float(losses["loss_bbox"]))


def test_loss_pos_topk_gather_exact(setup):
    """The positive-gather fast path (loss_pos_topk) must be exact vs the
    full per-anchor decoded loss — same value, same head gradients — since
    every dropped term is weight-0 and avg_factor is unchanged."""
    cfg0, model, variables, images = setup
    boxes, labels, mask = _gt_batch()
    cls_scores, bbox_preds = model.apply(variables, images)

    def run(topk):
        cfg = retina_config(NUM_CLASSES, img_size=(H, W),
                            loss_bbox=lambda *a, **k: sph2pob_iou_loss(
                                *a, mode="ciou", **k),
                            reg_decoded_bbox=True, loss_pos_topk=topk)

        def f(preds):
            return retina_loss(cfg, cls_scores, preds, cfg.flat_anchors(),
                               boxes, labels, mask)["loss_bbox"]

        val, grad = jax.value_and_grad(
            lambda p: f(p))(bbox_preds)
        return float(val), grad

    # topk=16 (< anchors, >= positives) must match the full path (topk=0)
    v_full, g_full = run(0)
    v_gather, g_gather = run(16)
    assert np.isclose(v_full, v_gather, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_gather)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


def test_no_gt_image(setup):
    cfg, model, variables, images = setup
    boxes, labels, _ = _gt_batch()
    mask = jnp.zeros((B, MAX_GT), bool)
    cls_scores, bbox_preds = model.apply(variables, images)
    losses = retina_loss(cfg, cls_scores, bbox_preds, cfg.flat_anchors(),
                         boxes, labels, mask)
    assert np.isfinite(float(losses["loss_cls"]))
    assert float(losses["loss_bbox"]) == 0.0


def test_predict_shapes_and_validity(setup):
    cfg, model, variables, images = setup
    cls_scores, bbox_preds = model.apply(variables, images)
    level_anchors = cfg.anchor_generator.grid_anchors(cfg.featmap_sizes())
    res = retina_predict(cfg, cls_scores, bbox_preds, level_anchors)
    assert res.boxes.shape == (B, cfg.max_per_img, 4)
    assert res.scores.shape == (B, cfg.max_per_img)
    assert res.labels.shape == (B, cfg.max_per_img)
    sc = np.asarray(res.scores)
    assert (sc[:, :-1] >= sc[:, 1:] - 1e-6).all()  # sorted
    v = np.asarray(res.valid)
    assert (np.asarray(res.labels)[~v] == -1).all()


def test_train_step_jits_and_descends(setup):
    import optax

    cfg, model, variables, images = setup
    boxes, labels, mask = _gt_batch()
    anchors = cfg.flat_anchors()
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, images, boxes, labels, mask):
        def loss_fn(p):
            cls_scores, bbox_preds = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]}, images)
            losses = retina_loss(cfg, cls_scores, bbox_preds, anchors,
                                 boxes, labels, mask)
            return losses["loss_cls"] + losses["loss_bbox"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, images, boxes,
                                       labels, mask)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_two_stage_preselect_matches_exact_topk():
    """The anchor-first pair top-k equals exact flattened top-k (same
    selected pairs) when the anchor stage is exact."""
    import jax

    from sph_retina_tpu.models.single_stage import _select_level

    class Cfg:
        score_thr = 0.05
        approx_topk = True

    rng = np.random.default_rng(0)
    n, c, k = 512, 37, 100
    scores = jnp.asarray(rng.uniform(0, 1, (n, c)).astype(np.float32))
    deltas = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    priors = jnp.asarray(rng.uniform(10, 80, (n, 4)).astype(np.float32))

    top, label, d, p, valid = _select_level(Cfg(), scores, deltas, priors, k)

    flat = np.asarray(scores).reshape(-1)
    want = np.sort(flat)[::-1][:k]
    got = np.sort(np.asarray(top))[::-1]
    # ka=min(k,n)=100 < n: approx stage may drop ~1% of anchors; demand
    # >=99% of the exact top-k pair scores are recovered
    assert (np.abs(got - want) < 1e-6).mean() >= 0.99
    # every returned pair's score must equal scores[anchor, class]
    # (consistency of the two-stage index arithmetic)
    sel_scores = np.asarray(scores)[
        np.argmax((np.asarray(d)[:, None, :] ==
                   np.asarray(deltas)[None, :, :]).all(-1), axis=1),
        np.asarray(label)]
    np.testing.assert_allclose(np.asarray(top), sel_scores, atol=1e-6)

def test_remat_backbone_identical_math():
    """remat=True (gradient checkpointing on the residual blocks) must not
    change params, outputs, or gradients — only the backward-pass memory
    schedule. Trains the same, checkpoints interchange."""
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (1, 64, 128, 3))
    cfg = retina_config(NUM_CLASSES, img_size=(64, 128))
    base = SphRetinaNet(num_classes=NUM_CLASSES, depth=18, dtype=jnp.float32)
    rem = SphRetinaNet(num_classes=NUM_CLASSES, depth=18, dtype=jnp.float32,
                       remat=True)
    v1 = base.init(rng, images)
    v2 = rem.init(rng, images)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    boxes, labels, mask = _gt_batch()
    anchors = cfg.flat_anchors()

    def loss_of(model):
        def f(params):
            cls, reg = model.apply({"params": params,
                                    "batch_stats": v1["batch_stats"]},
                                   images)
            losses = retina_loss(cfg, cls, reg, anchors, boxes[:1],
                                 labels[:1], mask[:1])
            return sum(losses.values())
        return f

    l1, g1 = jax.value_and_grad(loss_of(base))(v1["params"])
    l2, g2 = jax.value_and_grad(loss_of(rem))(v2["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_preserves_resnext_width():
    """Regression: nn.remat rebinds the block class, so the ResNeXt
    groups/base_width threading must key on block_kind — with remat on,
    an X-variant backbone must produce identical param shapes."""
    from sph_retina_tpu.models.resnet import ResNet

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3))
    v0 = ResNet(depth=50, groups=32, base_width=4,
                dtype=jnp.float32).init(jax.random.PRNGKey(1), x)
    v1 = ResNet(depth=50, groups=32, base_width=4, remat=True,
                dtype=jnp.float32).init(jax.random.PRNGKey(1), x)
    s0 = jax.tree_util.tree_map(lambda a: a.shape, v0)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, v1)
    assert s0 == s1
    # the grouped 3x3 actually is ResNeXt-wide: width = 64*(4/64)*32 = 128
    k = v1["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128 // 32, 128)
