"""Faster R-CNN spherical detector: RPN + RoIAlign + 2FC box head.

Reference composition (sphdet/models/heads/sph_rpn_head.py:10-144 and
sph_rcnn_head.py:205-332 over mmdet TwoStageDetector):

- RPN: shared 3x3 conv, per-anchor sigmoid objectness + box_version deltas;
  proposals = per-level top-k -> decode -> NMS (levels kept apart).
- RoI: spherical rois -> ERP-chart xyxy (obb2hbb cover for RBFoV,
  sph_rcnn_head.py:211-230) -> RoIAlign on FPN features -> Shared2FC head
  (softmax classes+bg, per-box deltas).

TPU design: proposals and sampled rois are fixed-size masked arrays; the
RoIAlign is pure-jnp bilinear gathers evaluated on all four FPN levels with
a per-roi level select (static shapes, no mmcv CUDA op —
SingleRoIExtractor parity incl. the FPN level-mapping formula).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coders import SphBBoxCoder
from ..boxes.nms import NMSResult, sph_batched_nms, sph_batched_soft_nms
from ..losses.focal_loss import _bce_with_logits
from ..ops.gather import take_rows
from .fpn import FPN
from .resnet import ResNet
from .single_stage import _batch_pairwise_iou
from ..boxes.anchors import SphAnchorGenerator


# --------------------------------------------------------------------------- #
# modules
# --------------------------------------------------------------------------- #
class SphRPNHead(nn.Module):
    box_version: int = 4
    feat_channels: int = 256
    num_base_priors: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="rpn_conv")
        cls_conv = nn.Conv(self.num_base_priors, (1, 1), dtype=self.dtype,
                           name="rpn_cls")
        reg_conv = nn.Conv(self.num_base_priors * self.box_version, (1, 1),
                           dtype=self.dtype, name="rpn_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            b, h, w, _ = x.shape
            t = nn.relu(conv(x))
            cls_scores.append(
                cls_conv(t).astype(jnp.float32).reshape(b, h * w * self.num_base_priors))
            bbox_preds.append(
                reg_conv(t).astype(jnp.float32).reshape(
                    b, h * w * self.num_base_priors, self.box_version))
        return cls_scores, bbox_preds


class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    box_version: int = 4
    fc_channels: int = 1024
    roi_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_feats: jax.Array):
        """roi_feats: (R, roi_size, roi_size, C) -> (R, C+1), (R, D)."""
        x = roi_feats.reshape(roi_feats.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name="fc_cls")(x).astype(jnp.float32)
        reg = nn.Dense(self.box_version, dtype=self.dtype,
                       name="fc_reg")(x).astype(jnp.float32)
        return cls, reg


class SphFasterRCNN(nn.Module):
    """Backbone + FPN; RPN and RoI head exposed as submodule methods."""

    num_classes: int
    box_version: int = 4
    depth: int = 50
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    remat: bool = False

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype,
                               groups=self.groups,
                               base_width=self.base_width,
                               remat=self.remat)
        self.neck = FPN(out_channels=256, start_level=0, num_outs=5,
                        add_extra_convs="on_output", dtype=self.dtype)
        self.rpn_head = SphRPNHead(box_version=self.box_version,
                                   dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes,
                                           box_version=self.box_version,
                                           dtype=self.dtype)

    def extract_feats(self, images):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        feats = self.extract_feats(images)
        return self.rpn(feats), feats

    def init_all(self, images):
        """Touches every submodule so ``model.init`` creates all params
        (plain __call__ never reaches the RoI head)."""
        (rpn_out, feats) = self(images)
        dummy = jnp.zeros((1, 7, 7, feats[0].shape[-1]), feats[0].dtype)
        self.roi(dummy)
        return rpn_out, feats


# --------------------------------------------------------------------------- #
# RoIAlign (pure jnp, SingleRoIExtractor semantics)
# --------------------------------------------------------------------------- #
def _bilinear_sample(feat: jax.Array, x: jax.Array, y: jax.Array):
    """feat (H, W, C); x/y (...,) in feature coords -> (..., C)."""
    h, w, _ = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return feat[yy, xx]

    top = at(y0, x0) * (1 - wx)[..., None] + at(y0, x0 + 1) * wx[..., None]
    bot = at(y0 + 1, x0) * (1 - wx)[..., None] + at(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _hat_weights(coords: jax.Array, size: int) -> jax.Array:
    """Bilinear interpolation weights as a dense matrix.

    coords (..., S) in feature coords -> (..., S, size) where row s holds the
    hat function max(0, 1 - |coord_s - i|): exactly the two-tap bilinear
    weights, with edge clamping folded in by clipping the coordinate.
    """
    c = jnp.clip(coords, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=coords.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - grid))


def roi_align(feat: jax.Array, rois_xyxy: jax.Array, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2):
    """RoIAlign on one feature map: (H, W, C) x (R, 4) -> (R, s, s, C).

    TPU formulation: bilinear sampling = two dense interpolation matmuls
    (separable hat-function weights) on the MXU instead of per-point
    gathers — gathers are the slow path on TPU; matmuls are the fast one.
    """
    s, sr = out_size, sampling_ratio
    h, w, c = feat.shape
    x1, y1, x2, y2 = (rois_xyxy[:, i] * spatial_scale for i in range(4))
    bw = jnp.maximum(x2 - x1, 1e-3) / s
    bh = jnp.maximum(y2 - y1, 1e-3) / s
    off = ((jnp.arange(s)[:, None] + (jnp.arange(sr) + 0.5)[None, :] / sr)
           .reshape(-1))                                  # (s*sr,)
    gx = x1[:, None] + off[None, :] * bw[:, None] - 0.5   # (R, s*sr)
    gy = y1[:, None] + off[None, :] * bh[:, None] - 0.5

    # Sub-sample averaging is linear in the interpolation weights, so fold
    # the mean over the sr sub-samples into the hat matrices up front:
    # mean_s bilinear(g_s) == interp with averaged weights, exactly. Halves
    # the sample axis (S = out_size instead of out_size * sr) everywhere.
    r = gy.shape[0]
    wy = _hat_weights(gy, h).reshape(r, s, sr, h).mean(2)  # (R, s, H)
    wx = _hat_weights(gx, w).reshape(r, s, sr, w).mean(2)  # (R, s, W)
    wy = wy.astype(feat.dtype)
    wx = wx.astype(feat.dtype)
    # The (R, s, spatial, C) intermediate is the HBM-bandwidth bottleneck
    # (the matmuls themselves are cheap): contract the WIDER spatial dim
    # first so it carries the narrower one (ERP charts have W = 2H), and
    # keep the whole chain in the feature dtype (bf16 in the model path) so
    # both the intermediate and its backward-pass gradients move half the
    # bytes of a float32 formulation.
    if w >= h:
        tmp = jnp.einsum("rtw,hwc->rthc", wx, feat,
                         preferred_element_type=feat.dtype)
        out = jnp.einsum("rsh,rthc->rstc", wy, tmp,
                         preferred_element_type=feat.dtype)
    else:
        tmp = jnp.einsum("rsh,hwc->rswc", wy, feat,
                         preferred_element_type=feat.dtype)
        out = jnp.einsum("rtw,rswc->rstc", wx, tmp,
                         preferred_element_type=feat.dtype)
    return out.astype(feat.dtype)


def multilevel_roi_align(feats: Sequence[jax.Array], rois_xyxy: jax.Array,
                         strides=(4, 8, 16, 32), out_size: int = 7,
                         finest_scale: float = 56.0):
    """RoIAlign over FPN levels with mmdet's level-mapping rule:
    level = floor(log2(sqrt(area) / finest_scale + 1e-6)) clamped to range.
    Evaluated on every level and selected per roi (static shapes)."""
    w = rois_xyxy[:, 2] - rois_xyxy[:, 0]
    h = rois_xyxy[:, 3] - rois_xyxy[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(strides) - 1).astype(jnp.int32)

    per_level = jnp.stack([
        roi_align(f, rois_xyxy, out_size, 1.0 / s)
        for f, s in zip(feats, strides)
    ])  # (L, R, s, s, C)
    return jnp.take_along_axis(
        per_level, lvl[None, :, None, None, None], axis=0)[0]


# --------------------------------------------------------------------------- #
# config + functional paths
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int
    box_version: int = 4
    img_size: tuple = (512, 1024)
    strides: tuple = (4, 8, 16, 32, 64)
    num_proposals: int = 512       # kept per image after RPN NMS
    num_rois: int = 256            # sampled rois per image for training
    pos_fraction: float = 0.25
    sampler_type: str = "random"   # "random" | "ohem" (hard-example mining)
    assign_backend: str = "sph2pob_efficient"
    # second-stage regression loss (reference pattern
    # faster_rcnn_r50_fpn_ciou_1x_coco.py:5-6: bbox_head.reg_decoded_bbox
    # + an IoU-family loss_bbox on decoded boxes). None -> the mmdet
    # default L1 on coder deltas.
    loss_bbox: Any = None
    reg_decoded_bbox: bool = False
    rpn_nms_iou: float = 0.7
    rpn_nms_pre: int = 1000
    approx_topk: bool = True  # see DetectorConfig.approx_topk
    # Upper bound on the NMS candidate set across levels: the (k, k) IoU
    # matrix is O(B k^2) HBM, so the per-level top-k survivors are re-ranked
    # globally to this cap before suppression (k=4384 at 512x1024 would
    # allocate 19 GB).
    rpn_matrix_cap: int = 2048
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    nms_backend: str = "planar"
    # rcnn nms=dict(type='soft_nms') — reference preset
    # faster_rcnn_r50_fpn_soft_nms_1x_coco.py:11 (final detections only,
    # RPN keeps hard suppression as there)
    nms_type: str = "nms"
    soft_method: str = "linear"
    soft_sigma: float = 0.5
    soft_min_score: float = 1e-3

    def anchor_generator(self):
        return SphAnchorGenerator(strides=list(self.strides),
                                  ratios=[0.5, 1.0, 2.0], scales=[8.0],
                                  box_version=self.box_version)

    def rpn_coder(self):
        return SphBBoxCoder(box_version=self.box_version)

    def rcnn_coder(self):
        stds = (0.1, 0.1, 0.2, 0.2) + ((0.1,) if self.box_version == 5 else ())
        return SphBBoxCoder(box_version=self.box_version,
                            target_stds=stds)

    def rpn_assigner(self):
        return MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                              min_pos_iou=0.3)

    def rcnn_assigner(self):
        return MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5,
                              min_pos_iou=0.5, match_low_quality=False)

    def featmap_sizes(self):
        h, w = self.img_size
        return [(-(-h // s), -(-w // s)) for s in self.strides]

    def flat_anchors(self):
        return self.anchor_generator().flat_anchors(self.featmap_sizes())


def faster_rcnn_config(num_classes, img_size=(512, 1024), **kw):
    return FasterRCNNConfig(num_classes=num_classes, img_size=img_size, **kw)


def _sph_to_chart_xyxy(boxes, img_size, box_version):
    """Spherical degrees -> chart xyxy; RBFoV takes the hbb cover."""
    h, w = img_size
    sx, sy = w / 360.0, h / 180.0
    cx, cy = boxes[..., 0] * sx, boxes[..., 1] * sy
    bw, bh = boxes[..., 2] * sx, boxes[..., 3] * sy
    if box_version == 5:
        ang = jnp.deg2rad(boxes[..., 4])
        ca, sa = jnp.abs(jnp.cos(ang)), jnp.abs(jnp.sin(ang))
        bw, bh = ca * bw + sa * bh, sa * bw + ca * bh
    x1 = jnp.clip(cx - bw / 2, 0, w)
    x2 = jnp.clip(cx + bw / 2, 0, w)
    y1 = jnp.clip(cy - bh / 2, 0, h)
    y2 = jnp.clip(cy + bh / 2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def rpn_proposals(cfg: FasterRCNNConfig, rpn_cls, rpn_reg):
    """Per-image fixed-size proposals (B, P, D) + scores + validity."""
    level_anchors = cfg.anchor_generator().grid_anchors(cfg.featmap_sizes())
    coder = cfg.rpn_coder()

    def single(per_img):
        cls_lv, reg_lv = per_img
        tops, boxes_all, ids, valid = [], [], [], []
        for lvl, (logits, deltas, priors) in enumerate(
                zip(cls_lv, reg_lv, level_anchors)):
            s = jax.nn.sigmoid(logits)
            k = min(cfg.rpn_nms_pre, s.shape[0])
            if getattr(cfg, "approx_topk", True) and k < s.shape[0]:
                top, idx = jax.lax.approx_max_k(s, k, recall_target=0.99)
            else:
                top, idx = jax.lax.top_k(s, k)
            boxes = coder.decode(priors[idx], deltas[idx])
            tops.append(top)
            boxes_all.append(boxes)
            ids.append(jnp.full((k,), lvl, jnp.int32))
            valid.append(jnp.ones((k,), bool))
        total = sum(t.shape[0] for t in tops)
        res = sph_batched_nms(
            jnp.concatenate(boxes_all), jnp.concatenate(tops),
            jnp.concatenate(ids),
            iou_threshold=cfg.rpn_nms_iou, max_num=cfg.num_proposals,
            nms_pre=min(cfg.rpn_matrix_cap, total),
            backend=cfg.nms_backend,
            valid_mask=jnp.concatenate(valid))
        return res.boxes, res.scores, res.valid

    return jax.vmap(single)((rpn_cls, rpn_reg))


def rpn_loss(cfg: FasterRCNNConfig, rpn_cls, rpn_reg, gt_boxes, gt_mask):
    anchors = cfg.flat_anchors()
    cls = jnp.concatenate(rpn_cls, axis=1)   # (B, N)
    reg = jnp.concatenate(rpn_reg, axis=1)   # (B, N, D)
    coder = cfg.rpn_coder()
    assigner = cfg.rpn_assigner()
    overlaps = jax.lax.stop_gradient(
        _batch_pairwise_iou(gt_boxes, anchors, cfg.assign_backend))

    def single(ov, boxes, mask, cls_i, reg_i):
        res = assigner(ov, mask)
        pos = res.gt_inds > 0
        neg = res.gt_inds == 0
        safe = jnp.clip(res.gt_inds - 1, 0, boxes.shape[0] - 1)
        targets = coder.encode(anchors, take_rows(boxes, safe))
        bce = _bce_with_logits(cls_i, pos.astype(jnp.float32))
        loss_cls = jnp.sum(jnp.where(pos | neg, bce, 0.0))
        l1 = jnp.sum(jnp.abs(reg_i - targets), axis=-1)
        loss_reg = jnp.sum(jnp.where(pos, l1, 0.0))
        return loss_cls, loss_reg, jnp.sum(pos), jnp.sum(pos | neg)

    lc, lr, np_, ns = jax.vmap(single)(overlaps, gt_boxes, gt_mask, cls, reg)
    denom = jnp.maximum(jnp.sum(ns), 1.0)
    return {"loss_rpn_cls": jnp.sum(lc) / denom,
            "loss_rpn_bbox": jnp.sum(lr) / jnp.maximum(jnp.sum(np_), 1.0)}


class RoITargets(NamedTuple):
    rois: jax.Array          # (B, R, D) spherical degrees
    labels: jax.Array        # (B, R) in [0, C]; C = bg
    reg_targets: jax.Array   # (B, R, D)
    weights: jax.Array       # (B, R) sample mask
    pos_mask: jax.Array      # (B, R)


def sample_rois(cfg: FasterRCNNConfig, rng, proposals, prop_valid,
                gt_boxes, gt_labels, gt_mask,
                hardness_fn=None) -> RoITargets:
    """Assign + subsample proposals (gt boxes appended as proposals).

    ``hardness_fn(cand (B,K,D), labels (B,K)) -> (B,K)`` enables OHEM
    (reference ``OHEMSampler.hard_mining``,
    /root/reference/mmdet/core/bbox/samplers/ohem_sampler.py:10-61 and the
    shipped preset faster_rcnn_r50_fpn_ohem_1x_coco.py): candidates are
    ranked by per-roi loss from a no-grad head forward instead of a random
    priority, and the hardest positives/negatives are kept.
    """
    coder = cfg.rcnn_coder()
    assigner = cfg.rcnn_assigner()
    b, g = gt_boxes.shape[:2]
    cand = jnp.concatenate([proposals, gt_boxes], axis=1)   # (B, P+G, D)
    cand_valid = jnp.concatenate([prop_valid, gt_mask], axis=1)
    # per-image (G, P+G) IoU via the fused componentwise pipeline (candidates
    # differ per image, so the shared-anchor batch kernel doesn't apply)
    from ..ops.fused_iou import fused_sph2pob_iou

    d = cand.shape[-1]
    overlaps = jax.lax.stop_gradient(fused_sph2pob_iou(
        [gt_boxes[..., :, None, i] for i in range(d)],
        [cand[..., None, :, i] for i in range(d)],
    ))  # (B, G, P+G)

    num_pos_max = int(cfg.num_rois * cfg.pos_fraction)
    num_neg_max = cfg.num_rois - num_pos_max

    def assign(ov, cvalid, labels, mask):
        ov = jnp.where(cvalid[None, :], ov, -1.0)
        res = assigner(ov, mask, labels)
        pos = (res.gt_inds > 0) & cvalid
        neg = (res.gt_inds == 0) & cvalid
        full_labels = jnp.where(pos, res.labels, cfg.num_classes)
        return res.gt_inds, pos, neg, full_labels.astype(jnp.int32)

    gt_inds, pos_m, neg_m, full_labels = jax.vmap(assign)(
        overlaps, cand_valid, gt_labels, gt_mask)

    # OHEM: rank candidates by their (no-grad) loss instead of randomly
    hardness = None
    if hardness_fn is not None:
        hardness = jax.lax.stop_gradient(hardness_fn(cand, full_labels))

    def single(r, cands, gti, pos, neg, flabels, boxes, hard):
        r1, r2 = jax.random.split(r)

        def pick(rr, m, k):
            prio = hard if hard is not None else \
                jax.random.uniform(rr, m.shape)
            prio = jnp.where(m, prio, -jnp.inf)
            _, idx = jax.lax.top_k(prio, k)
            keep = jnp.take(m, idx)
            return idx, keep

        pos_idx, pos_keep = pick(r1, pos, num_pos_max)
        neg_idx, neg_keep = pick(r2, neg, num_neg_max)
        idx = jnp.concatenate([pos_idx, neg_idx])
        keep = jnp.concatenate([pos_keep, neg_keep])
        pos_sel = jnp.concatenate(
            [pos_keep, jnp.zeros_like(neg_keep)])

        rois = cands[idx]
        safe = jnp.clip(gti[idx] - 1, 0, boxes.shape[0] - 1)
        matched = boxes[safe]
        reg_t = coder.encode(rois, matched)
        lab = jnp.where(pos_sel, flabels[idx], cfg.num_classes)
        return rois, lab.astype(jnp.int32), reg_t, keep.astype(jnp.float32), pos_sel

    rngs = jax.random.split(rng, b)
    rois, labels, reg_t, w, pos = jax.vmap(single)(
        rngs, cand, gt_inds, pos_m, neg_m, full_labels, gt_boxes, hardness)
    return RoITargets(rois, labels, reg_t, w, pos)


def roi_features(cfg: FasterRCNNConfig, feats, rois):
    """(B, R, D) spherical rois -> (B, R, 7, 7, C) aligned features."""
    xyxy = _sph_to_chart_xyxy(rois, cfg.img_size, cfg.box_version)
    return jax.vmap(lambda f0, f1, f2, f3, r: multilevel_roi_align(
        (f0, f1, f2, f3), r, strides=cfg.strides[:4]))(
        feats[0], feats[1], feats[2], feats[3], xyxy)


def rcnn_loss(cfg: FasterRCNNConfig, cls_logits, reg_pred, targets: RoITargets):
    """cls_logits (B*R, C+1), reg_pred (B*R, D)."""
    b, r = targets.labels.shape
    labels = targets.labels.reshape(-1)
    w = targets.weights.reshape(-1)
    pos = targets.pos_mask.reshape(-1)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
    d = reg_pred.shape[-1]
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    if cfg.reg_decoded_bbox and cfg.loss_bbox is not None:
        # decode both sides against the sampled rois; decode(encode(gt))
        # recovers the matched GT (coder round-trip), so the loss compares
        # decoded predictions to true boxes — reference reg_decoded_bbox
        # semantics without widening RoITargets.
        coder = cfg.rcnn_coder()
        rois = targets.rois.reshape(-1, d)
        pred_boxes = coder.decode(rois, reg_pred)
        tgt_boxes = coder.decode(rois, targets.reg_targets.reshape(-1, d))
        loss_reg = cfg.loss_bbox(
            pred_boxes, tgt_boxes,
            jnp.broadcast_to(pos.astype(jnp.float32)[:, None],
                             pred_boxes.shape),
            avg_factor=num_pos)
    else:
        l1 = jnp.sum(
            jnp.abs(reg_pred - targets.reg_targets.reshape(-1, d)), -1)
        loss_reg = jnp.sum(jnp.where(pos, l1, 0.0)) / num_pos
    return {"loss_cls": loss_cls, "loss_bbox": loss_reg}


def rcnn_predict(cfg: FasterRCNNConfig, cls_logits, reg_pred, rois,
                 roi_valid) -> NMSResult:
    """Per-image second-stage decode + NMS.

    cls_logits (B, P, C+1), reg_pred (B, P, D), rois (B, P, D)."""
    coder = cfg.rcnn_coder()

    def single(logits, reg, roi, valid):
        probs = jax.nn.softmax(logits, axis=-1)[:, :-1]      # (P, C)
        boxes = coder.decode(roi, reg)                        # (P, D)
        p, c = probs.shape
        flat = jnp.where(probs > cfg.score_thr, probs, -1.0).reshape(-1)
        flat = jnp.where(jnp.repeat(valid, c), flat, -1.0)
        k = min(cfg.rpn_nms_pre, p * c)
        top, idx = jax.lax.top_k(flat, k)
        box_idx = idx // c
        labels = (idx % c).astype(jnp.int32)
        if cfg.nms_type == "soft_nms":
            return sph_batched_soft_nms(
                boxes[box_idx], top, labels,
                iou_threshold=cfg.nms_iou_thr, sigma=cfg.soft_sigma,
                min_score=cfg.soft_min_score, method=cfg.soft_method,
                max_num=cfg.max_per_img, nms_pre=k,
                backend=cfg.nms_backend, valid_mask=top > 0)
        return sph_batched_nms(
            boxes[box_idx], top, labels,
            iou_threshold=cfg.nms_iou_thr, max_num=cfg.max_per_img,
            nms_pre=k, backend=cfg.nms_backend, valid_mask=top > 0)

    return jax.vmap(single)(cls_logits, reg_pred, rois, roi_valid)
