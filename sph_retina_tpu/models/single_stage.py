"""Single-stage spherical detector: module + functional train/test paths.

Architecture parity with the reference RetinaNet pipeline
(mmdet/models/detectors/single_stage.py:57-110 + sphdet SphRetinaHead), laid
out TPU-first:

- the network (backbone -> FPN -> head) is one Flax module over NHWC
  bfloat16 features;
- target assignment, loss, and decode+NMS are *pure functions* over the
  padded batch (gt boxes padded to MAX_GT with a mask), so the whole train
  step jits into a single XLA program with no host sync;
- the anchors x gt IoU matrix for assignment runs through the fused Pallas
  pairwise kernel in one call for the whole batch
  ((B*MAX_GT, N) — nothing image-looped).

Loss semantics follow mmdet AnchorHead.loss/_get_targets_single
(anchor_head.py:301-530): focal classification over pos+neg anchors with
avg_factor = total positives, regression over positives (optionally on
decoded boxes for IoU-family losses).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..boxes.anchors import SphAnchorGenerator
from ..boxes.assigner import MaxIoUAssigner
from ..boxes.coders import SphBBoxCoder
from ..boxes.nms import NMSResult, sph_batched_nms, sph_batched_soft_nms
from ..ops.gather import take_rows
from ..losses import sigmoid_focal_loss
from .fpn import FPN
from .heads.retina_head import SphRetinaHead
from .resnet import ResNet


class SphRetinaNet(nn.Module):
    """ResNet + FPN + RetinaHead; returns per-level flattened outputs."""

    num_classes: int
    box_version: int = 4
    depth: int = 50
    feat_channels: int = 256
    num_base_priors: int = 9
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       dtype=self.dtype, groups=self.groups,
                       base_width=self.base_width, remat=self.remat,
                       name="backbone")(images)
        feats = FPN(out_channels=self.feat_channels, start_level=1,
                    num_outs=5, add_extra_convs="on_input", dtype=self.dtype,
                    name="neck")(feats)
        cls_scores, bbox_preds = SphRetinaHead(
            num_classes=self.num_classes,
            box_version=self.box_version,
            feat_channels=self.feat_channels,
            num_base_priors=self.num_base_priors,
            dtype=self.dtype,
            name="bbox_head",
        )(feats)
        return cls_scores, bbox_preds


# --------------------------------------------------------------------------- #
# functional training path
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Bundles the declarative pieces the reference spreads over configs."""

    num_classes: int
    box_version: int = 4
    img_size: tuple = (512, 1024)  # (H, W)
    anchor_generator: SphAnchorGenerator = None
    bbox_coder: SphBBoxCoder = None
    assigner: MaxIoUAssigner = None
    loss_bbox: Callable = None
    reg_decoded_bbox: bool = False
    assign_backend: str = "sph2pob_efficient"
    # test cfg (sph_retinanet_r50_fpn.py:61-68)
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    nms_backend: str = "planar"
    # nms=dict(type='soft_nms', ...) selects score-decay suppression
    # (reference preset faster_rcnn_r50_fpn_soft_nms_1x_coco.py:11)
    nms_type: str = "nms"
    soft_method: str = "linear"
    soft_sigma: float = 0.5
    soft_min_score: float = 1e-3
    # focal loss
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # nms_pre preselection via jax.lax.approx_max_k (TPU-optimized two-stage
    # reduction, ~40x faster than exact top_k over the ~2.7M flattened
    # (anchor, class) scores of a level; recall 0.99 only reorders
    # near-threshold candidates that greedy NMS would drop anyway). Set
    # False for bit-exact reference preselection.
    approx_topk: bool = True
    # Decoded-box regression losses (reg_decoded_bbox) run per anchor, but
    # only positives carry weight (~10^2 of ~10^5 per image). Gathering the
    # top-K anchors by bbox weight before the loss keeps the expensive loss
    # math (e.g. KentLoss's 121-point deg2kent fwd+bwd) off the 99.9%
    # zero-weight anchors — exact whenever positives <= K, since dropped
    # terms have weight 0 and the avg_factor is unchanged. K is per-image;
    # 1024 is ~10x any realistic RetinaNet positive count. Set 0 to
    # disable (full per-anchor loss).
    loss_pos_topk: int = 1024

    def featmap_sizes(self):
        # ceil: stride-2 convs output ceil(in/2), so tiny inputs still give
        # one cell on the coarsest levels
        h, w = self.img_size
        return [(-(-h // s), -(-w // s)) for s in self.anchor_generator.strides]

    def flat_anchors(self):
        return self.anchor_generator.flat_anchors(self.featmap_sizes())


def retina_config(num_classes: int, box_version: int = 4, img_size=(512, 1024),
                  loss_bbox: Callable | None = None,
                  reg_decoded_bbox: bool = False, **overrides) -> DetectorConfig:
    """The reference's sph_retinanet_r50_fpn defaults."""
    from ..losses import sph_l1_loss

    return DetectorConfig(
        num_classes=num_classes,
        box_version=box_version,
        img_size=img_size,
        anchor_generator=SphAnchorGenerator(
            strides=[8, 16, 32, 64, 128],
            ratios=[0.5, 1.0, 2.0],
            octave_base_scale=4,
            scales_per_octave=3,
            box_version=box_version,
        ),
        bbox_coder=SphBBoxCoder(box_version=box_version),
        assigner=MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                min_pos_iou=0.0),
        loss_bbox=loss_bbox if loss_bbox is not None else sph_l1_loss,
        reg_decoded_bbox=reg_decoded_bbox,
        **overrides,
    )


class AnchorTargets(NamedTuple):
    labels: jax.Array          # (B, N) int32 in [0, num_classes]; C = bg
    label_weights: jax.Array   # (B, N)
    bbox_targets: jax.Array    # (B, N, D)
    bbox_weights: jax.Array    # (B, N)
    num_pos: jax.Array         # () total positives in batch


def _batch_pairwise_iou(gt: jax.Array, anchors: jax.Array, backend: str):
    """(B, G, D) x (N, D) -> (B, G, N), one fused kernel call."""
    from ..ops.pallas_iou import _on_tpu, sph2pob_iou_pairwise_tpu

    b, g, d = gt.shape
    flat = gt.reshape(b * g, d)
    from ..iou.api import canonical_backend

    if canonical_backend(backend) == "sph2pob_efficient" and _on_tpu():
        iou = sph2pob_iou_pairwise_tpu(flat, anchors)
    else:
        from ..iou.api import sph_overlaps

        iou = sph_overlaps(flat, anchors, backend)
    return iou.reshape(b, g, anchors.shape[0])


def anchor_targets(
    cfg: DetectorConfig,
    anchors: jax.Array,        # (N, D)
    gt_boxes: jax.Array,       # (B, G, D) degrees, padded
    gt_labels: jax.Array,      # (B, G) int32
    gt_mask: jax.Array,        # (B, G) bool
) -> AnchorTargets:
    overlaps = jax.lax.stop_gradient(
        _batch_pairwise_iou(gt_boxes, anchors, cfg.assign_backend)
    )

    def single(ov, boxes, labels, mask):
        res = cfg.assigner(ov, mask, labels)
        pos = res.gt_inds > 0
        neg = res.gt_inds == 0
        safe = jnp.clip(res.gt_inds - 1, 0, boxes.shape[0] - 1)
        matched = take_rows(boxes, safe)           # (N, D), ops/gather.py
        if cfg.reg_decoded_bbox:
            targets = matched
        else:
            targets = cfg.bbox_coder.encode(anchors, matched)
        labels_out = jnp.where(pos, res.labels, cfg.num_classes)
        return (
            labels_out.astype(jnp.int32),
            (pos | neg).astype(jnp.float32),
            jnp.where(pos[:, None], targets, 0.0),
            pos.astype(jnp.float32),
            jnp.sum(pos),
        )

    labels, lw, bt, bw, np_ = jax.vmap(single)(overlaps, gt_boxes, gt_labels, gt_mask)
    return AnchorTargets(labels, lw, bt, bw, jnp.sum(np_))


def retina_loss(
    cfg: DetectorConfig,
    cls_scores: Sequence[jax.Array],   # per level (B, n_l, C)
    bbox_preds: Sequence[jax.Array],   # per level (B, n_l, D)
    anchors: jax.Array,                # (N, D) flat over levels
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_mask: jax.Array,
) -> dict:
    cls = jnp.concatenate(cls_scores, axis=1)   # (B, N, C)
    reg = jnp.concatenate(bbox_preds, axis=1)   # (B, N, D)
    t = anchor_targets(cfg, anchors, gt_boxes, gt_labels, gt_mask)
    num_total = jnp.maximum(t.num_pos, 1.0)

    loss_cls = sigmoid_focal_loss(
        cls.reshape(-1, cfg.num_classes),
        t.labels.reshape(-1),
        t.label_weights.reshape(-1),
        gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha,
        avg_factor=num_total,
    )

    b, n, d = reg.shape
    if cfg.reg_decoded_bbox:
        pred_boxes = cfg.bbox_coder.decode(anchors[None], reg)
        preds = pred_boxes.reshape(-1, d)
        targets = t.bbox_targets.reshape(-1, d)
        weights = t.bbox_weights.reshape(-1)
        k = min(b * cfg.loss_pos_topk, b * n) if cfg.loss_pos_topk else 0
        pos_dropped = None
        if 0 < k < b * n:
            # Positive-gather: the loss only sees the K highest-weight
            # anchors — exact only while positives <= K (dropped terms are
            # weight-0; see DetectorConfig.loss_pos_topk). A breach
            # truncates the regression loss, so it is surfaced as
            # metric_pos_dropped in the logged metrics (0 in any healthy
            # run; gradient-free, excluded from the optimized total).
            pos_dropped = jnp.maximum(
                jnp.sum((weights > 0).astype(jnp.int32)) - k, 0
            ).astype(jnp.float32)
            weights, idx = jax.lax.top_k(weights, k)
            preds = preds[idx]
            targets = targets[idx]
        loss_bbox = cfg.loss_bbox(
            preds, targets, weights, avg_factor=num_total,
        )
        if pos_dropped is not None:
            return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                    "metric_pos_dropped": jax.lax.stop_gradient(pos_dropped)}
    else:
        loss_bbox = cfg.loss_bbox(
            reg.reshape(-1, d),
            t.bbox_targets.reshape(-1, d),
            jnp.repeat(t.bbox_weights.reshape(-1)[:, None], d, axis=-1),
            avg_factor=num_total,
        )
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


# --------------------------------------------------------------------------- #
# functional inference path
# --------------------------------------------------------------------------- #
def _select_level(cfg, scores, deltas, priors, k):
    """Per-level score filtering + top-k (filter_scores_and_topk parity).

    Fast path: top-k over the (n*c) (anchor, class) pairs via an
    anchor-first two-stage reduction — per-anchor class max (one bandwidth
    pass), approx top-k over the n anchor maxima, then exact top-k pairs
    within the surviving anchors' full class rows. Any pair in the global
    top-k has anchor-max >= the k-th pair score, and at most k anchors do,
    so the survivor set provably contains every global top-k pair (exact
    but for approx_max_k's 0.99 anchor recall and ties). ~6x faster than
    approx_max_k over the flattened pairs on the 2.7M-score level-0 tensor
    (the post-process was dominated by exactly that reduction).
    """
    n, c = scores.shape
    k = min(k, n * c)
    if getattr(cfg, "approx_topk", True) and k < n * c:
        ka = min(k, n)
        anchor_best = jnp.max(scores, axis=1)
        _, aidx = jax.lax.approx_max_k(anchor_best, ka, recall_target=0.99)
        rows = scores[aidx]                                   # (ka, c)
        flat = jnp.where(rows > cfg.score_thr, rows, -1.0).reshape(-1)
        top, pidx = jax.lax.top_k(flat, k)                    # exact, small
        anchor_idx = aidx[pidx // c]
        label = (pidx % c).astype(jnp.int32)
    else:
        flat = jnp.where(scores > cfg.score_thr, scores, -1.0).reshape(-1)
        top, idx = jax.lax.top_k(flat, k)
        anchor_idx = idx // c
        label = (idx % c).astype(jnp.int32)
    return (
        top,
        label,
        deltas[anchor_idx],
        priors[anchor_idx],
        top > 0.0,  # validity (score_thr filter)
    )


def retina_predict(
    cfg: DetectorConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    level_anchors: Sequence[jax.Array],
) -> NMSResult:
    """Decode + per-class NMS; returns fixed-size per-image results (vmapped
    over the batch)."""

    def single(per_level):
        scores_lv, deltas_lv = per_level
        parts = []
        for scores, deltas, priors in zip(scores_lv, deltas_lv, level_anchors):
            s = jax.nn.sigmoid(scores)
            parts.append(_select_level(cfg, s, deltas, priors, cfg.nms_pre))
        top = jnp.concatenate([p[0] for p in parts])
        labels = jnp.concatenate([p[1] for p in parts])
        deltas = jnp.concatenate([p[2] for p in parts])
        priors = jnp.concatenate([p[3] for p in parts])
        valid = jnp.concatenate([p[4] for p in parts])
        boxes = cfg.bbox_coder.decode(priors, deltas)
        if cfg.nms_type == "soft_nms":
            return sph_batched_soft_nms(
                boxes, top, labels,
                iou_threshold=cfg.nms_iou_thr,
                sigma=cfg.soft_sigma,
                min_score=cfg.soft_min_score,
                method=cfg.soft_method,
                max_num=cfg.max_per_img,
                nms_pre=cfg.nms_pre,
                backend=cfg.nms_backend,
                valid_mask=valid,
            )
        return sph_batched_nms(
            boxes, top, labels,
            iou_threshold=cfg.nms_iou_thr,
            max_num=cfg.max_per_img,
            nms_pre=cfg.nms_pre,
            backend=cfg.nms_backend,
            valid_mask=valid,
        )

    return jax.vmap(single)((cls_scores, bbox_preds))
