"""MaxIoU anchor-GT assignment, vectorized for static shapes.

Semantics of mmdet's MaxIoUAssigner.assign_wrt_overlaps
(/root/reference/mmdet/core/bbox/assigners/max_iou_assigner.py:135-222):

1. default: ignore (-1)
2. max_overlap < neg_thr        -> background (0)
3. max_overlap >= pos_thr       -> that gt (i+1)
4. match_low_quality: every gt claims its best anchor(s) if its best overlap
   >= min_pos_iou — later gts overwrite earlier ones (loop order), which we
   reproduce with a last-wins reversed argmax.

GT boxes arrive padded to a fixed count with a validity mask; masked gts are
forced out of contention by setting their overlap rows to -1. The reference's
CPU offload above ``gpu_assign_thr`` (max_iou_assigner.py:100-111) is
obsolete here: the pairwise IoU matrix comes from the Pallas kernel and the
whole assignment is a handful of fused reductions.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AssignResult(NamedTuple):
    """gt_inds: (N,) int32, -1 ignore / 0 background / i+1 -> gt i.
    max_overlaps: (N,) float32. labels: (N,) int32 (-1 where unassigned)."""

    gt_inds: jax.Array
    max_overlaps: jax.Array
    labels: jax.Array


@dataclasses.dataclass(frozen=True)
class MaxIoUAssigner:
    pos_iou_thr: float = 0.5
    neg_iou_thr: float | tuple = 0.4
    min_pos_iou: float = 0.0
    gt_max_assign_all: bool = True
    match_low_quality: bool = True

    def __call__(
        self,
        overlaps: jax.Array,      # (G, N) gt x anchors
        gt_mask: jax.Array,       # (G,) bool validity of padded gts
        gt_labels: jax.Array | None = None,  # (G,) int32
    ) -> AssignResult:
        g, n = overlaps.shape
        # Padded gts read as zero overlap, so with no valid gt every anchor
        # falls in [0, neg_thr) -> background (mmdet's empty-gt branch,
        # max_iou_assigner.py:152-158). -1 stays reserved for ignore regions.
        overlaps = jnp.where(gt_mask[:, None], overlaps, 0.0)

        max_overlaps = jnp.max(overlaps, axis=0)          # (N,)
        argmax_overlaps = jnp.argmax(overlaps, axis=0)    # (N,)
        gt_max = jnp.max(overlaps, axis=1)                # (G,)

        assigned = jnp.full((n,), -1, jnp.int32)
        if isinstance(self.neg_iou_thr, tuple):
            neg_lo, neg_hi = self.neg_iou_thr
        else:
            neg_lo, neg_hi = 0.0, self.neg_iou_thr
        assigned = jnp.where(
            (max_overlaps >= neg_lo) & (max_overlaps < neg_hi), 0, assigned
        )
        pos = max_overlaps >= self.pos_iou_thr
        assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

        if self.match_low_quality:
            # candidate[i, n]: anchor n is (one of) gt i's best anchors and
            # gt i clears min_pos_iou.
            good_gt = gt_mask & (gt_max >= self.min_pos_iou)
            if self.gt_max_assign_all:
                cand = (overlaps == gt_max[:, None]) & good_gt[:, None]
            else:
                best = jax.nn.one_hot(
                    jnp.argmax(overlaps, axis=1), n, dtype=bool
                )
                cand = best & good_gt[:, None]
            # last gt in loop order wins -> argmax over reversed gt index
            rev = cand[::-1, :]
            winner = (g - 1) - jnp.argmax(rev, axis=0)     # (N,)
            has_cand = jnp.any(cand, axis=0)
            assigned = jnp.where(
                has_cand, winner.astype(jnp.int32) + 1, assigned
            )

        if gt_labels is None:
            labels = jnp.full((n,), -1, jnp.int32)
        else:
            from ..ops.gather import take_rows  # deferred: avoid cycle

            safe_idx = jnp.clip(assigned - 1, 0, g - 1)
            # gt_labels[safe_idx] via one-hot matmul: per-anchor gathers
            # are the TPU slow path (ops/gather.py).
            picked = take_rows(gt_labels.astype(jnp.int32), safe_idx)
            labels = jnp.where(assigned > 0, picked, -1)
        return AssignResult(assigned, max_overlaps, labels)
