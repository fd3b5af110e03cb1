"""FCOS spherical detector: anchor-free head + functional loss/predict.

Reference: sphdet/models/heads/sph_fcos_head.py (FCOSHead with
box_version-wide reg conv; targets computed by converting gt spherical ->
pixel xyxy in the ERP chart, min-area assignment over points with
regress-range gating; centerness-weighted decoded-box loss). mmdet FCOS
defaults: GroupNorm towers, per-level learnable scales, exp-activated
distances, regress ranges (-1,64),(64,128),(128,256),(256,512),(512,inf).

TPU formulation: targets are a fully-vectorized (P points x G padded gts)
masked min-area reduction — no per-image python, one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..boxes.coders import DistancePointSphBBoxCoder
from ..boxes.nms import NMSResult, sph_batched_nms
from ..losses import sigmoid_focal_loss
from ..ops.gather import take_rows, take_rows_batched
from ..losses.focal_loss import _bce_with_logits
from .fpn import FPN
from .resnet import ResNet

INF = 1e8


class Scale(nn.Module):
    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, ())
        return x * s


class SphFCOSHead(nn.Module):
    num_classes: int
    box_version: int = 4
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        import math

        cls_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name=f"cls_conv_{i}"),
             nn.GroupNorm(num_groups=32, name=f"cls_gn_{i}"))
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            (nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name=f"reg_conv_{i}"),
             nn.GroupNorm(num_groups=32, name=f"reg_gn_{i}"))
            for i in range(self.stacked_convs)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1,
                           dtype=self.dtype, bias_init=bias_init,
                           name="conv_cls")
        conv_reg = nn.Conv(self.box_version, (3, 3), padding=1,
                           dtype=self.dtype, name="conv_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                                  name="conv_centerness")
        scales = [Scale(name=f"scale_{i}") for i in range(self.num_levels)]

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = x, x
            for conv, gn in cls_convs:
                cls_feat = nn.relu(gn(conv(cls_feat).astype(jnp.float32)))
                cls_feat = cls_feat.astype(self.dtype)
            for conv, gn in reg_convs:
                reg_feat = nn.relu(gn(conv(reg_feat).astype(jnp.float32)))
                reg_feat = reg_feat.astype(self.dtype)
            b, h, w, _ = x.shape
            cls_out = conv_cls(cls_feat).astype(jnp.float32)
            reg_out = scales[lvl](conv_reg(reg_feat).astype(jnp.float32))
            reg_out = jnp.exp(reg_out)  # positive distances
            ctr_out = conv_centerness(reg_feat).astype(jnp.float32)
            cls_scores.append(cls_out.reshape(b, h * w, self.num_classes))
            bbox_preds.append(reg_out.reshape(b, h * w, self.box_version))
            centernesses.append(ctr_out.reshape(b, h * w))
        return cls_scores, bbox_preds, centernesses


class SphFCOS(nn.Module):
    num_classes: int
    box_version: int = 4
    depth: int = 50
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    remat: bool = False

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, dtype=self.dtype,
                       groups=self.groups, base_width=self.base_width,
                       remat=self.remat, name="backbone")(images)
        feats = FPN(out_channels=256, start_level=1, num_outs=5,
                    add_extra_convs="on_input", dtype=self.dtype,
                    name="neck")(feats)
        return SphFCOSHead(num_classes=self.num_classes,
                           box_version=self.box_version, dtype=self.dtype,
                           name="bbox_head")(feats)


# --------------------------------------------------------------------------- #
# config / points / targets
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    num_classes: int
    box_version: int = 4
    img_size: tuple = (512, 1024)
    strides: tuple = (8, 16, 32, 64, 128)
    regress_ranges: tuple = ((-1, 64), (64, 128), (128, 256), (256, 512),
                             (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    loss_bbox: Callable = None
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    nms_backend: str = "planar"
    approx_topk: bool = True

    def featmap_sizes(self):
        h, w = self.img_size
        return [(-(-h // s), -(-w // s)) for s in self.strides]

    def coder(self):
        return DistancePointSphBBoxCoder(img_size=self.img_size,
                                         box_version=self.box_version)

    def level_points(self):
        """Per-level (P_l, 2) pixel centers + per-point stride/range."""
        pts, strides, ranges = [], [], []
        for (h, w), s, rr in zip(self.featmap_sizes(), self.strides,
                                 self.regress_ranges):
            ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            p = jnp.stack([(xs.reshape(-1) + 0.5) * s,
                           (ys.reshape(-1) + 0.5) * s], axis=-1)
            pts.append(p.astype(jnp.float32))
            strides.append(jnp.full((p.shape[0],), s, jnp.float32))
            ranges.append(jnp.broadcast_to(jnp.asarray(rr, jnp.float32),
                                           (p.shape[0], 2)))
        return pts, strides, ranges


def fcos_config(num_classes, img_size=(512, 1024), loss_bbox=None, **kw):
    from ..losses import sph_iou_loss

    return FCOSConfig(num_classes=num_classes, img_size=img_size,
                      loss_bbox=loss_bbox or sph_iou_loss, **kw)


class FCOSTargets(NamedTuple):
    labels: jax.Array        # (B, P)
    bbox_targets: jax.Array  # (B, P, 4[+1]) l/t/r/b distances (+gamma)
    centerness: jax.Array    # (B, P)


def _gt_to_chart_xyxy(gt_boxes, img_size):
    h, w = img_size
    sx, sy = w / 360.0, h / 180.0
    cx, cy = gt_boxes[..., 0] * sx, gt_boxes[..., 1] * sy
    bw, bh = gt_boxes[..., 2] * sx, gt_boxes[..., 3] * sy
    return jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     axis=-1)


def fcos_targets(cfg: FCOSConfig, gt_boxes, gt_labels, gt_mask) -> FCOSTargets:
    """(B, G, D) padded gts -> per-point targets, fully vectorized."""
    pts, strides, ranges = cfg.level_points()
    points = jnp.concatenate(pts)            # (P, 2)
    stride = jnp.concatenate(strides)        # (P,)
    rr = jnp.concatenate(ranges)             # (P, 2)

    def single(boxes, labels, mask):
        xyxy = _gt_to_chart_xyxy(boxes, cfg.img_size)      # (G, 4)
        areas = (xyxy[:, 2] - xyxy[:, 0]) * (xyxy[:, 3] - xyxy[:, 1])
        xs, ys = points[:, 0:1], points[:, 1:2]            # (P, 1)
        left = xs - xyxy[:, 0][None, :]                    # (P, G)
        top = ys - xyxy[:, 1][None, :]
        right = xyxy[:, 2][None, :] - xs
        bottom = xyxy[:, 3][None, :] - ys
        dists = jnp.stack([left, top, right, bottom], axis=-1)  # (P, G, 4)

        if cfg.center_sampling:
            r = cfg.center_sample_radius * stride[:, None]
            cxs = (xyxy[:, 0] + xyxy[:, 2])[None, :] / 2
            cys = (xyxy[:, 1] + xyxy[:, 3])[None, :] / 2
            x_min = jnp.maximum(cxs - r, xyxy[:, 0][None, :])
            y_min = jnp.maximum(cys - r, xyxy[:, 1][None, :])
            x_max = jnp.minimum(cxs + r, xyxy[:, 2][None, :])
            y_max = jnp.minimum(cys + r, xyxy[:, 3][None, :])
            inside = (
                (xs > x_min) & (xs < x_max) & (ys > y_min) & (ys < y_max)
            )
        else:
            inside = jnp.min(dists, axis=-1) > 0

        max_dist = jnp.max(dists, axis=-1)
        in_range = (max_dist >= rr[:, 0:1]) & (max_dist <= rr[:, 1:2])

        cand_areas = jnp.where(inside & in_range & mask[None, :],
                               areas[None, :], INF)
        min_area = jnp.min(cand_areas, axis=-1)
        min_idx = jnp.argmin(cand_areas, axis=-1)          # (P,)
        pos = min_area < INF

        labels_out = jnp.where(pos, take_rows(labels, min_idx),
                               cfg.num_classes)
        tgt = take_rows_batched(dists, min_idx)
        if cfg.box_version == 5:
            gamma = take_rows(boxes[:, 4:5], min_idx)
            tgt = jnp.concatenate([tgt, gamma], axis=-1)
        lr = tgt[:, [0, 2]]
        tb = tgt[:, [1, 3]]
        ctr = jnp.sqrt(jnp.clip(
            (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
            * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)),
            0.0, 1.0))
        return labels_out.astype(jnp.int32), tgt, jnp.where(pos, ctr, 0.0)

    labels, tgts, ctr = jax.vmap(single)(gt_boxes, gt_labels, gt_mask)
    return FCOSTargets(labels, tgts, ctr)


def fcos_loss(cfg: FCOSConfig, cls_scores, bbox_preds, centernesses,
              gt_boxes, gt_labels, gt_mask) -> dict:
    cls = jnp.concatenate(cls_scores, axis=1)     # (B, P, C)
    reg = jnp.concatenate(bbox_preds, axis=1)     # (B, P, D)
    ctr = jnp.concatenate(centernesses, axis=1)   # (B, P)
    t = fcos_targets(cfg, gt_boxes, gt_labels, gt_mask)
    pos = (t.labels >= 0) & (t.labels < cfg.num_classes)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    loss_cls = sigmoid_focal_loss(
        cls.reshape(-1, cfg.num_classes), t.labels.reshape(-1),
        avg_factor=num_pos)

    pts, strides, _ = cfg.level_points()
    points = jnp.concatenate(pts)                 # (P, 2)
    coder = cfg.coder()
    pred_boxes = coder.decode(points[None], reg[..., :4])
    tgt_boxes = coder.decode(points[None], t.bbox_targets[..., :4])
    if cfg.box_version == 5:
        pred_boxes = jnp.concatenate([pred_boxes, reg[..., 4:5]], -1)
        tgt_boxes = jnp.concatenate([tgt_boxes, t.bbox_targets[..., 4:5]], -1)

    ctr_denorm = jnp.maximum(jnp.sum(jnp.where(pos, t.centerness, 0.0)), 1e-6)
    d = pred_boxes.shape[-1]
    # weight as (N, 1): broadcasts over coords for elementwise (L1-family)
    # losses; reduce_box_weight collapses it back to (N,) for per-box
    # (IoU-family) losses.
    loss_bbox = cfg.loss_bbox(
        pred_boxes.reshape(-1, d), tgt_boxes.reshape(-1, d),
        jnp.where(pos, t.centerness, 0.0).reshape(-1)[:, None],
        avg_factor=ctr_denorm)

    ctr_bce = _bce_with_logits(ctr, t.centerness)
    loss_ctr = jnp.sum(jnp.where(pos, ctr_bce, 0.0)) / num_pos
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_centerness": loss_ctr}


def fcos_predict(cfg: FCOSConfig, cls_scores, bbox_preds, centernesses
                 ) -> NMSResult:
    pts, _, _ = cfg.level_points()
    coder = cfg.coder()

    def single(per_img):
        scores_lv, reg_lv, ctr_lv = per_img
        tops, labels_all, boxes_all, valid_all = [], [], [], []
        for scores, reg, ctr, points in zip(scores_lv, reg_lv, ctr_lv, pts):
            s = jax.nn.sigmoid(scores) * jax.nn.sigmoid(ctr)[:, None]
            n, c = s.shape
            k = min(cfg.nms_pre, n * c)
            if getattr(cfg, "approx_topk", True) and k < n * c:
                # anchor-first two-stage pair top-k (exact but for the 0.99
                # point recall; see single_stage._select_level for the proof)
                ka = min(k, n)
                _, pid0 = jax.lax.approx_max_k(jnp.max(s, axis=1), ka,
                                               recall_target=0.99)
                rows = s[pid0]
                flat = jnp.where(rows > cfg.score_thr, rows, -1.0).reshape(-1)
                top, pidx = jax.lax.top_k(flat, k)
                pid = pid0[pidx // c]
                labels = (pidx % c).astype(jnp.int32)
            else:
                flat = jnp.where(s > cfg.score_thr, s, -1.0).reshape(-1)
                top, idx = jax.lax.top_k(flat, k)
                pid = idx // c
                labels = (idx % c).astype(jnp.int32)
            boxes = coder.decode(points[pid], reg[pid][:, :4])
            if cfg.box_version == 5:
                boxes = jnp.concatenate([boxes, reg[pid][:, 4:5]], -1)
            tops.append(top)
            labels_all.append(labels)
            boxes_all.append(boxes)
            valid_all.append(top > 0)
        return sph_batched_nms(
            jnp.concatenate(boxes_all), jnp.concatenate(tops),
            jnp.concatenate(labels_all),
            iou_threshold=cfg.nms_iou_thr, max_num=cfg.max_per_img,
            nms_pre=cfg.nms_pre, backend=cfg.nms_backend,
            valid_mask=jnp.concatenate(valid_all))

    return jax.vmap(single)((cls_scores, bbox_preds, centernesses))
