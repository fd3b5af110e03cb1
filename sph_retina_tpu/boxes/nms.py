"""Spherical and planar NMS as fixed-shape masked suppression.

The reference's SphNMS is a Python greedy loop calling a spherical IoU per
step (sphdet/bbox/nms/sph_nms.py:62-74), and PlanarNMS converts to planar
boxes for CUDA batched_nms (planar_nms.py:8-18). On TPU both become:

1. top-k pre-selection (``nms_pre`` candidates, score-descending),
2. one (k, k) IoU matrix — the fused Pallas pairwise kernel for spherical
   backends, a cheap chart IoU for the planar path,
3. an exact greedy scan as a ``fori_loop`` of k vectorized suppression steps
   (classes kept apart by masking the IoU matrix, since spherical boxes
   cannot use the coordinate-offset trick),
4. top-``max_num`` of the survivors, returned as fixed-size arrays + mask.

Everything is jit-compatible with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .formator import sph2planar_boxes

NEG_INF = -1e10


class NMSResult(NamedTuple):
    boxes: jax.Array    # (max_num, D) spherical degrees
    scores: jax.Array   # (max_num,)
    labels: jax.Array   # (max_num,) int32
    inds: jax.Array     # (max_num,) indices into the input arrays
    valid: jax.Array    # (max_num,) bool


def _pairwise_iou(boxes: jax.Array, backend: str) -> jax.Array:
    # imported lazily: iou.api pulls in boxes.formator, so a module-level
    # import here would be circular
    from ..iou.api import sph_overlaps
    from ..ops.pallas_iou import _on_tpu, sph2pob_iou_pairwise_tpu

    if backend in ("planar", "planar_nms"):
        planar = sph2planar_boxes(boxes)
        if planar.shape[-1] == 4:  # xyxy
            lt = jnp.maximum(planar[:, None, :2], planar[None, :, :2])
            rb = jnp.minimum(planar[:, None, 2:], planar[None, :, 2:])
            wh = jnp.maximum(rb - lt, 0.0)
            inter = wh[..., 0] * wh[..., 1]
            area = (planar[:, 2] - planar[:, 0]) * (planar[:, 3] - planar[:, 1])
            return inter / (area[:, None] + area[None, :] - inter + 1e-8)
        from ..iou.rotated import rotated_box_iou

        return rotated_box_iou(planar[:, None, :], planar[None, :, :])
    from ..iou.api import canonical_backend

    if canonical_backend(backend) == "sph2pob_efficient" and _on_tpu():
        return sph2pob_iou_pairwise_tpu(boxes, boxes)
    return sph_overlaps(boxes, boxes, backend)


def _greedy_suppress(iou: jax.Array, valid: jax.Array, thr: float) -> jax.Array:
    """Exact score-descending greedy NMS over a pre-sorted candidate set.

    Greedy NMS is the unique fixpoint of the dominance recurrence
    ``keep[i] = valid[i] and not any(j < i, keep[j], iou[j, i] > thr)``
    (unique by strong induction on the score order). Iterating the map from
    ``keep = valid`` stabilizes the first undecided box every sweep, so it
    reaches that fixpoint in at most chain-depth iterations — a handful in
    practice — each a fully vectorized (k, k) masked reduction. The naive
    alternative, a k-step sequential greedy scan, is latency-bound on TPU
    (k small vector ops in a row); this form replaces it with O(depth)
    VPU-wide sweeps and an early-exit ``while_loop``.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    dom = (iou > thr) & (idx[:, None] < idx[None, :])  # j (row) can kill i

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it <= k)

    def body(carry):
        keep, _, it = carry
        new = valid & ~jnp.any(dom & keep[:, None], axis=0)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, jnp.int32(0)))
    return keep


def sph_batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    *,
    iou_threshold: float = 0.5,
    max_num: int = 100,
    nms_pre: int = 1000,
    backend: str = "sph2pob_efficient",
    class_agnostic: bool = False,
    valid_mask: jax.Array | None = None,
) -> NMSResult:
    """Per-class greedy NMS with a spherical (or planar-chart) IoU backend.

    Args:
        boxes: (N, 4|5) spherical boxes, degrees.
        scores: (N,) confidence scores.
        idxs: (N,) int class ids (suppression only within a class unless
            ``class_agnostic``).
        valid_mask: optional (N,) validity of padded inputs.
    """
    n = boxes.shape[0]
    k = min(nms_pre, n)
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, NEG_INF)

    top_scores, order = jax.lax.top_k(s, k)
    top_boxes = boxes[order]
    top_idxs = idxs[order]

    iou = _pairwise_iou(top_boxes, backend)
    if not class_agnostic:
        same = top_idxs[:, None] == top_idxs[None, :]
        iou = jnp.where(same, iou, 0.0)

    keep = _greedy_suppress(iou, top_scores > NEG_INF / 2, iou_threshold)

    m = min(max_num, k)
    final_scores, sel = jax.lax.top_k(jnp.where(keep, top_scores, NEG_INF), m)
    valid = final_scores > NEG_INF / 2
    return NMSResult(
        boxes=top_boxes[sel],
        scores=jnp.where(valid, final_scores, 0.0),
        labels=jnp.where(valid, top_idxs[sel], -1).astype(jnp.int32),
        inds=order[sel],
        valid=valid,
    )


def planar_batched_nms(boxes, scores, idxs, **kwargs) -> NMSResult:
    """PlanarNMS parity: chart-space suppression, spherical boxes returned."""
    kwargs["backend"] = "planar"
    return sph_batched_nms(boxes, scores, idxs, **kwargs)


def sph_batched_soft_nms(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    *,
    iou_threshold: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
    max_num: int = 100,
    nms_pre: int = 1000,
    backend: str = "sph2pob_efficient",
    class_agnostic: bool = False,
    valid_mask: jax.Array | None = None,
) -> NMSResult:
    """Soft-NMS with a spherical (or planar-chart) IoU backend.

    Reference capability: mmcv ``soft_nms`` selected by the shipped preset
    /root/reference/configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py:11
    (``nms=dict(type='soft_nms', iou_threshold=0.5)``). Instead of removing
    overlapping boxes, each picked box decays the scores of its overlaps —
    ``linear``: ``s *= 1 - iou`` where ``iou > iou_threshold``;
    ``gaussian``: ``s *= exp(-iou^2 / sigma)`` (Bodla et al., ICCV 2017).

    TPU form: soft-NMS is sequential in the decayed-score order, but only
    the first ``max_num`` picks can appear in the output (every pick's
    score is frozen at pick time and scores only ever decrease), so an
    exact ``fori_loop`` of ``max_num`` argmax+decay sweeps over the (k,)
    score vector suffices — no data-dependent shapes.
    """
    n = boxes.shape[0]
    k = min(nms_pre, n)
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, NEG_INF)

    top_scores, order = jax.lax.top_k(s, k)
    top_boxes = boxes[order]
    top_idxs = idxs[order]

    iou = _pairwise_iou(top_boxes, backend)
    if not class_agnostic:
        same = top_idxs[:, None] == top_idxs[None, :]
        iou = jnp.where(same, iou, 0.0)
    iou = iou * (1.0 - jnp.eye(k))  # a box never decays itself

    if method == "linear":
        decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
    elif method == "gaussian":
        decay = jnp.exp(-(iou * iou) / sigma)
    else:
        raise ValueError(f"soft-NMS method {method!r}")

    m = min(max_num, k)
    live = jnp.where(top_scores > NEG_INF / 2, top_scores, NEG_INF)

    def body(i, carry):
        live, out_sel, out_scores = carry
        j = jnp.argmax(live)
        sj = live[j]
        out_sel = out_sel.at[i].set(j)
        out_scores = out_scores.at[i].set(sj)
        live = live * jnp.where(sj > NEG_INF / 2, decay[j], 1.0)
        live = live.at[j].set(NEG_INF)
        return live, out_sel, out_scores

    _, sel, final_scores = jax.lax.fori_loop(
        0, m, body,
        (live, jnp.zeros((m,), jnp.int32), jnp.full((m,), NEG_INF)))
    valid = final_scores > jnp.maximum(min_score, NEG_INF / 2)
    return NMSResult(
        boxes=top_boxes[sel],
        scores=jnp.where(valid, final_scores, 0.0),
        labels=jnp.where(valid, top_idxs[sel], -1).astype(jnp.int32),
        inds=order[sel],
        valid=valid,
    )
