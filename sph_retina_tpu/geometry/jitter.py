"""Epsilon-jitter against degenerate box pairs.

Rotated-rectangle intersection is numerically unstable when two boxes share
edges/corners exactly (collinear edges yield 0/0 in the line-intersection
solve). The reference nudges near-identical pairs apart before the transform
and clamps into the open valid ranges (sph_iou_api.py:222-260); we reproduce
those semantics functionally (no in-place mutation, jnp.where masking).

Both functions are elementwise over leading axes and cheap enough to fuse into
whatever kernel follows them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-4 * 1.2345678
_ANG_EPS = 1e-3 * 1.2345678


def jitter_spherical_boxes(boxes1: jax.Array, boxes2: jax.Array):
    """Nudge near-identical spherical box pairs apart (degrees in/out).

    Any pair with some coordinate closer than ~1.2e-4 deg is shifted:
    box1 -= 2*eps, box2 += eps (all columns), then clamped into the open
    valid ranges theta in (0, 360), phi/alpha/beta in (0, 180).
    """
    eps = _EPS
    similar = jnp.any(jnp.abs(boxes1 - boxes2) < eps, axis=-1, keepdims=True)
    boxes1 = jnp.where(similar, boxes1 - 2.0 * eps, boxes1)
    boxes2 = jnp.where(similar, boxes2 + eps, boxes2)

    lo1 = jnp.array([2 * eps, 2 * eps, 2 * eps, 2 * eps])
    hi1 = jnp.array([360.0 - eps, 180.0 - eps, 180.0 - eps, 180.0 - eps])
    lo2 = jnp.array([eps, eps, eps, eps])
    hi2 = jnp.array([360.0 - 2 * eps, 180.0 - 2 * eps, 180.0 - 2 * eps, 180.0 - 2 * eps])
    if boxes1.shape[-1] == 5:
        # gamma clamped to (-360, 360) with eps margins; the reference clamps
        # only boxes2 (twice, sph_iou_api.py:256-258) — clearly a slip, we
        # clamp both symmetrically.
        lo1 = jnp.concatenate([lo1, jnp.array([-360.0 + 2 * eps])])
        hi1 = jnp.concatenate([hi1, jnp.array([360.0 - eps])])
        lo2 = jnp.concatenate([lo2, jnp.array([-360.0 + eps])])
        hi2 = jnp.concatenate([hi2, jnp.array([360.0 - 2 * eps])])
    boxes1 = jnp.clip(boxes1, lo1, hi1)
    boxes2 = jnp.clip(boxes2, lo2, hi2)
    return boxes1, boxes2


def jitter_rotated_boxes(pob1: jax.Array, pob2: jax.Array):
    """Nudge near-identical rotated boxes (cx, cy, w, h, ang_rad) apart."""
    eps = _EPS
    d1 = jnp.array([eps, eps, 2 * eps, 2 * eps, eps])
    d2 = jnp.array([2 * eps, 2 * eps, eps, eps, 5 * eps])
    cols = jnp.array([0, 2, 3, 4])
    similar = jnp.any(
        jnp.abs(pob1[..., cols] - pob2[..., cols]) < eps, axis=-1, keepdims=True
    )
    pob1 = jnp.where(similar, pob1 + d1, pob1)
    pob2 = jnp.where(similar, pob2 + d2, pob2)

    # Separate near-equal angles a bit more aggressively.
    ang_close = jnp.abs(pob1[..., 4] - pob2[..., 4]) < _ANG_EPS
    pob1 = pob1.at[..., 4].add(jnp.where(ang_close, _ANG_EPS, 0.0))
    pob2 = pob2.at[..., 4].add(jnp.where(ang_close, 2.0 * _ANG_EPS, 0.0))

    two_pi = 2.0 * jnp.pi
    pob1 = pob1.at[..., 2:4].set(jnp.maximum(pob1[..., 2:4], 2 * eps / 10.0))
    pob2 = pob2.at[..., 2:4].set(jnp.maximum(pob2[..., 2:4], eps / 10.0))
    pob1 = pob1.at[..., 4].set(
        jnp.clip(pob1[..., 4], -two_pi + 2 * eps, two_pi - eps)
    )
    pob2 = pob2.at[..., 4].set(
        jnp.clip(pob2[..., 4], -two_pi + eps, two_pi - 2 * eps)
    )
    return pob1, pob2
