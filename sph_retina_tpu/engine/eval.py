"""COCO-style AP evaluation with spherical IoU matching.

The reference evaluates metric='bbox' (COCO AP/AP50/AP75) where the
detection-GT matcher uses spherical IoU (missing sphdet.datasets class;
behavior reconstructed per SURVEY.md §2.1 row 9 / §5). Implementation:
pycocotools matching semantics — per class and IoU threshold, score-ordered
greedy matching, 101-point interpolated AP — with the IoU matrix computed
on-device by any ``sph_overlaps`` backend (padded to fixed shapes so one
compiled program serves every image).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

COCO_IOU_THRS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


@functools.lru_cache(maxsize=8)
def _iou_fn(backend: str, max_det: int, max_gt: int, box_version: int):
    from ..utils.memory import AvoidOOM

    @jax.jit
    def f(dets, gts):
        from ..iou.api import sph_overlaps

        return sph_overlaps(dets, gts, backend)

    # Device-OOM ladder (gc -> bf16 -> host) for very large det x gt
    # matrices, mirroring the reference's AvoidCUDAOOM around test-time ops
    # (/root/reference/mmdet/utils/memory.py:79). Fallbacks that change
    # numerics (bf16) always warn so a precision change in mAP matching is
    # never silent.
    return AvoidOOM()(f)


def _pairwise_iou_np(det_boxes, gt_boxes, backend, max_det=128, max_gt=64):
    """IoU matrix (n_det, n_gt) via a fixed-shape jitted program."""
    d = det_boxes.shape[1] if det_boxes.size else (
        gt_boxes.shape[1] if gt_boxes.size else 4)
    n_det, n_gt = len(det_boxes), len(gt_boxes)
    if n_det == 0 or n_gt == 0:
        return np.zeros((n_det, n_gt), np.float32)
    md = max(max_det, n_det)
    mg = max(max_gt, n_gt)
    pd = np.ones((md, d), np.float32)
    pg = np.ones((mg, d), np.float32)
    pd[:n_det] = det_boxes
    pg[:n_gt] = gt_boxes
    iou = _iou_fn(backend, md, mg, d)(jnp.asarray(pd), jnp.asarray(pg))
    return np.asarray(iou)[:n_det, :n_gt]


def _average_precision(recall, precision):
    """COCO 101-point interpolated AP."""
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    levels = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(mrec, levels, side="left")
    return float(np.mean(mpre[np.clip(idx, 0, len(mpre) - 1)]))


def eval_spherical_map(
    det_results: Sequence[tuple],
    annotations: Sequence[dict],
    num_classes: int,
    iou_thrs: Sequence[float] = COCO_IOU_THRS,
    backend: str = "unbiased",
    max_dets: int = 100,
) -> dict:
    """COCO-style mAP over spherical boxes.

    Args:
        det_results: per image (boxes (K, D), scores (K,), labels (K,))
            numpy arrays (invalid rows removed or scored 0).
        annotations: per image dicts with 'boxes' (G, D) and 'labels' (G,).
        num_classes: number of foreground classes.
        backend: spherical IoU backend used for matching.

    Returns:
        dict with 'mAP' (AP@[.5:.95]), 'AP50', 'AP75', 'per_class' array.
    """
    n_imgs = len(det_results)
    assert len(annotations) == n_imgs

    # Precompute per-image IoU between its dets and gts (class-agnostic).
    iou_mats = []
    for (boxes, scores, labels), ann in zip(det_results, annotations):
        order = np.argsort(-np.asarray(scores))[:max_dets]
        boxes = np.asarray(boxes)[order]
        iou_mats.append(_pairwise_iou_np(boxes, np.asarray(ann["boxes"]), backend))
    ordered = []
    for (boxes, scores, labels) in det_results:
        order = np.argsort(-np.asarray(scores))[:max_dets]
        ordered.append((np.asarray(boxes)[order], np.asarray(scores)[order],
                        np.asarray(labels)[order]))

    ap = np.zeros((len(iou_thrs), num_classes))
    valid_class = np.zeros(num_classes, bool)

    for c in range(num_classes):
        # gather detections of class c across images
        recs = []
        n_gt_total = 0
        per_img_gt_idx = []
        for i in range(n_imgs):
            gt_idx = np.where(np.asarray(annotations[i]["labels"]) == c)[0]
            per_img_gt_idx.append(gt_idx)
            n_gt_total += len(gt_idx)
            _, scores, labels = ordered[i]
            for k in np.where(labels == c)[0]:
                recs.append((float(scores[k]), i, int(k)))
        if n_gt_total == 0:
            continue
        valid_class[c] = True
        recs.sort(key=lambda r: -r[0])

        for t_i, thr in enumerate(iou_thrs):
            matched = [np.zeros(len(g), bool) for g in per_img_gt_idx]
            tp = np.zeros(len(recs))
            fp = np.zeros(len(recs))
            for r_i, (_, img, det_k) in enumerate(recs):
                gt_idx = per_img_gt_idx[img]
                if len(gt_idx) == 0:
                    fp[r_i] = 1
                    continue
                ious = iou_mats[img][det_k, gt_idx]
                free = ~matched[img]
                cand = np.where(free, ious, -1.0)
                best = int(np.argmax(cand))
                if cand[best] >= thr:
                    matched[img][best] = True
                    tp[r_i] = 1
                else:
                    fp[r_i] = 1
            ctp = np.cumsum(tp)
            cfp = np.cumsum(fp)
            recall = ctp / n_gt_total
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            ap[t_i, c] = _average_precision(recall, precision)

    mean_over_cls = ap[:, valid_class].mean(axis=1) if valid_class.any() else np.zeros(len(iou_thrs))
    thr_list = list(iou_thrs)
    return {
        "mAP": float(mean_over_cls.mean()),
        "AP50": float(mean_over_cls[thr_list.index(0.5)]) if 0.5 in thr_list else None,
        "AP75": float(mean_over_cls[thr_list.index(0.75)]) if 0.75 in thr_list else None,
        "per_class": ap,
        "valid_classes": valid_class,
    }
