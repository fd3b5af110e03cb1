"""RBFoV (5-dof rotated spherical boxes) end-to-end through RetinaNet."""

import jax
import jax.numpy as jnp
import numpy as np

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.models import SphRetinaNet
from sph_retina_tpu.models.single_stage import (
    retina_config, retina_loss, retina_predict,
)

B, H, W = 2, 64, 128
MAX_GT, NC = 6, 5


def test_rbfov_retinanet_loss_grads_predict():
    cfg = retina_config(NC, box_version=5, img_size=(H, W))
    model = SphRetinaNet(num_classes=NC, box_version=5, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3))
    variables = model.init(rng, images)

    boxes = jnp.stack([
        jnp.asarray(generate_boxes(MAX_GT, 5, seed=i, fov_range=(20, 70)))
        for i in range(B)])
    labels = jnp.tile(jnp.arange(MAX_GT) % NC, (B, 1))
    mask = jnp.tile(jnp.arange(MAX_GT) < 4, (B, 1))
    anchors = cfg.flat_anchors()
    assert anchors.shape[-1] == 5

    def f(params):
        cls, reg = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images)
        assert reg[0].shape[-1] == 5
        losses = retina_loss(cfg, cls, reg, anchors, boxes, labels, mask)
        return losses["loss_cls"] + losses["loss_bbox"]

    val, grads = jax.value_and_grad(f)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    cls, reg = model.apply(variables, images)
    level_anchors = cfg.anchor_generator.grid_anchors(cfg.featmap_sizes())
    res = retina_predict(cfg, cls, reg, level_anchors)
    assert res.boxes.shape == (B, cfg.max_per_img, 5)
    out = np.asarray(res.boxes)
    assert np.isfinite(out).all()
    # decoded gammas stay in the clamped range
    assert (np.abs(out[..., 4]) <= 90.0 + 1e-3).all()
