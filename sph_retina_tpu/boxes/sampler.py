"""Positive/negative samplers over assignment results — static-shape.

- PseudoSampler (RetinaNet/FCOS/SSD): all positives and negatives are used;
  returned as boolean masks.
- SphRandomSampler (Faster R-CNN; reference
  sphdet/bbox/sampler/sph_random_sampler.py:6-53 over mmdet RandomSampler):
  sample at most ``num * pos_fraction`` positives and fill the rest with
  negatives. TPU formulation: instead of gathering a variable-size index
  list, draw random priorities and keep the top-k within each group as a
  mask (identical distribution, fixed shapes).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    pos_mask: jax.Array  # (N,) bool
    neg_mask: jax.Array  # (N,) bool


def pseudo_sample(gt_inds: jax.Array) -> SampleResult:
    return SampleResult(gt_inds > 0, gt_inds == 0)


def _keep_topk_random(rng, mask: jax.Array, k: int) -> jax.Array:
    """Uniformly keep at most k True entries of ``mask`` (expected count)."""
    n = mask.shape[0]
    prio = jax.random.uniform(rng, (n,))
    prio = jnp.where(mask, prio, -1.0)
    # threshold = k-th largest priority among valid entries
    kth = jnp.sort(prio)[n - k] if k < n else -1.0
    count = jnp.sum(mask)
    return jnp.where(count <= k, mask, mask & (prio > kth))


@dataclasses.dataclass(frozen=True)
class RandomSampler:
    num: int = 256
    pos_fraction: float = 0.5
    neg_pos_ub: float = -1.0
    add_gt_as_proposals: bool = True  # handled by the RoI head

    def __call__(self, rng: jax.Array, gt_inds: jax.Array) -> SampleResult:
        pos_all = gt_inds > 0
        neg_all = gt_inds == 0
        num_pos_max = int(self.num * self.pos_fraction)
        r1, r2 = jax.random.split(rng)
        pos = _keep_topk_random(r1, pos_all, num_pos_max)
        num_neg_max = self.num - num_pos_max  # conservative static budget
        if self.neg_pos_ub > 0:
            num_neg_max = min(num_neg_max, int(self.neg_pos_ub * num_pos_max))
        neg = _keep_topk_random(r2, neg_all, num_neg_max)
        return SampleResult(pos, neg)
