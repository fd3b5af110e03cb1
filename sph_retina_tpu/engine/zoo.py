"""Detector zoo: one uniform interface over all model families.

Each family adapter exposes:
- ``build(cfg_dict)``      -> (flax module, detector config)
- ``init(model, rng, x)``  -> variables
- ``loss_fn(model, cfg)``  -> f(variables, batch, rng) -> (total, dict)
- ``predict_fn(model, cfg)``-> f(variables, images) -> NMSResult

This replaces the reference's registry-driven ``build_detector``
(mmdet/models/builder.py) with explicit adapters; the generic train step in
``make_generic_train_step`` serves every family (including the two-stage
Faster R-CNN whose loss needs an rng for RoI sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models import SphFCOS, SphFasterRCNN, SphRetinaNet, SphSSD
from ..models import faster_rcnn as frcnn
from ..models.fcos import fcos_config, fcos_loss, fcos_predict
from ..models.single_stage import retina_loss, retina_predict
from ..models.ssd import ssd_config, ssd_loss, ssd_predict
from .train import TrainState, maybe_normalize_images, total_loss


def _common(cfg_dict):
    m = cfg_dict["model"]
    bb = m.get("backbone", {})
    return dict(
        num_classes=m["num_classes"],
        box_version=m.get("box_version", 4),
        img_size=tuple(cfg_dict.get("img_size", (512, 1024))),
        backbone=dict(depth=bb.get("depth", 50),
                      groups=bb.get("groups", 1),
                      base_width=bb.get("base_width", 64),
                      remat=bb.get("remat", False)),
    )


def _reg_loss_kwargs(cfg_dict, *, decoded_flag=True):
    """model.loss_bbox / model.reg_decoded_bbox -> family-config kwargs
    (the same reference config surface build_detector_config parses for
    RetinaNet, so every family shares one loss axis)."""
    from ..losses import build_loss

    m = cfg_dict["model"]
    kw = {}
    if m.get("loss_bbox"):
        kw["loss_bbox"] = build_loss(m["loss_bbox"])
    if decoded_flag and "reg_decoded_bbox" in m:
        kw["reg_decoded_bbox"] = bool(m["reg_decoded_bbox"])
    return kw


class RetinaNetFamily:
    name = "SphRetinaNet"

    @staticmethod
    def build(cfg_dict):
        from .builder import build_detector_config, build_model

        return build_model(cfg_dict), build_detector_config(cfg_dict)

    @staticmethod
    def init(model, rng, x):
        return model.init(rng, x)

    @staticmethod
    def loss_fn(model, cfg):
        anchors = cfg.flat_anchors()

        def f(variables, batch, rng):
            del rng
            cls, reg = model.apply(variables, batch["images"])
            losses = retina_loss(cfg, cls, reg, anchors, batch["gt_boxes"],
                                 batch["gt_labels"], batch["gt_mask"])
            return total_loss(losses), losses

        return f

    @staticmethod
    def predict_fn(model, cfg):
        level_anchors = cfg.anchor_generator.grid_anchors(cfg.featmap_sizes())

        def f(variables, images):
            images = maybe_normalize_images(images)
            cls, reg = model.apply(variables, images)
            return retina_predict(cfg, cls, reg, level_anchors)

        return f


class FCOSFamily:
    name = "SphFCOS"

    @staticmethod
    def build(cfg_dict):
        c = _common(cfg_dict)
        dtype = jnp.bfloat16 if cfg_dict.get("bf16", True) else jnp.float32
        model = SphFCOS(num_classes=c["num_classes"],
                        box_version=c["box_version"], dtype=dtype,
                        **c["backbone"])
        return model, fcos_config(c["num_classes"], img_size=c["img_size"],
                                  box_version=c["box_version"],
                                  **_reg_loss_kwargs(cfg_dict,
                                                     decoded_flag=False))

    init = RetinaNetFamily.init

    @staticmethod
    def loss_fn(model, cfg):
        def f(variables, batch, rng):
            del rng
            cls, reg, ctr = model.apply(variables, batch["images"])
            losses = fcos_loss(cfg, cls, reg, ctr, batch["gt_boxes"],
                               batch["gt_labels"], batch["gt_mask"])
            return total_loss(losses), losses

        return f

    @staticmethod
    def predict_fn(model, cfg):
        def f(variables, images):
            images = maybe_normalize_images(images)
            cls, reg, ctr = model.apply(variables, images)
            return fcos_predict(cfg, cls, reg, ctr)

        return f


class SSDFamily:
    name = "SphSSD"

    @staticmethod
    def build(cfg_dict):
        c = _common(cfg_dict)
        dtype = jnp.bfloat16 if cfg_dict.get("bf16", True) else jnp.float32
        model = SphSSD(num_classes=c["num_classes"],
                       box_version=c["box_version"], dtype=dtype,
                       remat=c["backbone"]["remat"])
        return model, ssd_config(c["num_classes"], img_size=c["img_size"],
                                 box_version=c["box_version"],
                                 **_reg_loss_kwargs(cfg_dict))

    init = RetinaNetFamily.init

    @staticmethod
    def loss_fn(model, cfg):
        anchors = cfg.flat_anchors()

        def f(variables, batch, rng):
            del rng
            cls, reg = model.apply(variables, batch["images"])
            losses = ssd_loss(cfg, cls, reg, anchors, batch["gt_boxes"],
                              batch["gt_labels"], batch["gt_mask"])
            return total_loss(losses), losses

        return f

    @staticmethod
    def predict_fn(model, cfg):
        def f(variables, images):
            images = maybe_normalize_images(images)
            cls, reg = model.apply(variables, images)
            return ssd_predict(cfg, cls, reg)

        return f


class FasterRCNNFamily:
    name = "SphFasterRCNN"

    @staticmethod
    def build(cfg_dict):
        c = _common(cfg_dict)
        dtype = jnp.bfloat16 if cfg_dict.get("bf16", True) else jnp.float32
        model = SphFasterRCNN(num_classes=c["num_classes"],
                              box_version=c["box_version"], dtype=dtype,
                              **c["backbone"])
        from .builder import parse_test_nms_cfg

        sampler = cfg_dict.get("train_cfg", {}).get("sampler", {})
        sampler_type = {"OHEMSampler": "ohem", "ohem": "ohem"}.get(
            sampler.get("type", "random"), "random")
        return model, frcnn.faster_rcnn_config(
            c["num_classes"], img_size=c["img_size"],
            box_version=c["box_version"],
            sampler_type=sampler_type,
            **_reg_loss_kwargs(cfg_dict),
            **parse_test_nms_cfg(cfg_dict))

    @staticmethod
    def init(model, rng, x):
        return model.init(rng, x, method=SphFasterRCNN.init_all)

    @staticmethod
    def loss_fn(model, cfg):
        def f(variables, batch, rng):
            (rpn_cls, rpn_reg), feats = model.apply(variables, batch["images"])
            losses = frcnn.rpn_loss(cfg, rpn_cls, rpn_reg, batch["gt_boxes"],
                                    batch["gt_mask"])
            props, _, pvalid = frcnn.rpn_proposals(cfg, rpn_cls, rpn_reg)

            hardness_fn = None
            if cfg.sampler_type == "ohem":
                # no-grad head forward on every candidate; per-roi CE vs the
                # assigned label ranks hardness (OHEMSampler.hard_mining)
                def hardness_fn(cand, labels_full):
                    rf = frcnn.roi_features(cfg, feats, cand)
                    logits, _ = model.apply(
                        variables, rf.reshape(-1, 7, 7, rf.shape[-1]),
                        method=SphFasterRCNN.roi)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    ce = -jnp.take_along_axis(
                        logp, labels_full.reshape(-1, 1), axis=-1)[:, 0]
                    return ce.reshape(labels_full.shape)

            t = frcnn.sample_rois(
                cfg, rng, jax.lax.stop_gradient(props), pvalid,
                batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
                hardness_fn=hardness_fn)
            rf = frcnn.roi_features(cfg, feats, t.rois)
            cls, reg = model.apply(
                variables, rf.reshape(-1, 7, 7, rf.shape[-1]),
                method=SphFasterRCNN.roi)
            losses.update(frcnn.rcnn_loss(cfg, cls, reg, t))
            return total_loss(losses), losses

        return f

    @staticmethod
    def predict_fn(model, cfg):
        def f(variables, images):
            images = maybe_normalize_images(images)
            (rpn_cls, rpn_reg), feats = model.apply(variables, images)
            props, _, pvalid = frcnn.rpn_proposals(cfg, rpn_cls, rpn_reg)
            rf = frcnn.roi_features(cfg, feats, props)
            cls, reg = model.apply(
                variables, rf.reshape(-1, 7, 7, rf.shape[-1]),
                method=SphFasterRCNN.roi)
            b, p = props.shape[:2]
            return frcnn.rcnn_predict(cfg, cls.reshape(b, p, -1),
                                      reg.reshape(b, p, -1), props, pvalid)

        return f


FAMILIES = {
    "SphRetinaNet": RetinaNetFamily,
    "RetinaNet": RetinaNetFamily,
    "SphFCOS": FCOSFamily,
    "FCOS": FCOSFamily,
    "SphSSD": SSDFamily,
    "SSD": SSDFamily,
    "SphFasterRCNN": FasterRCNNFamily,
    "FasterRCNN": FasterRCNNFamily,
}


def get_family(cfg_dict):
    kind = cfg_dict["model"].get("type", "SphRetinaNet")
    if kind not in FAMILIES:
        raise ValueError(f"unknown detector type {kind!r}; "
                         f"choose from {sorted(set(FAMILIES))}")
    return FAMILIES[kind]


def make_generic_train_step(family, model, cfg, tx, seed: int = 0):
    """Train step serving every family; rng = fold_in(seed key, step) so RoI
    sampling etc. is deterministic per step yet responds to the user seed."""
    loss = family.loss_fn(model, cfg)
    base_rng = jax.random.PRNGKey(seed)

    def train_step(state: TrainState, batch: dict):
        from .train import maybe_normalize_images

        rng = jax.random.fold_in(base_rng, state.step)
        batch = dict(batch, images=maybe_normalize_images(batch["images"]))
        variables = {"params": None, "batch_stats": state.batch_stats}

        def compute(params):
            v = dict(variables, params=params)
            return loss(v, batch, rng)

        (total, losses), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, state.batch_stats,
                          opt_state), {"loss": total, **losses}

    return train_step
