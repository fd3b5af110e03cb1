"""Sph2Pob loss adapter: spherical boxes (degrees) -> planar oriented pairs.

Functional counterpart of the reference's ``@Sph2PobTransfrom`` class
decorator (/root/reference/sphdet/losses/sph2pob_transform.py:11-37): every
planar-OBB loss becomes a spherical loss by jittering the pair, running the
(differentiable) Sph2Pob transform, and jittering the resulting rotated
boxes. The transform is pair-dependent, so it must be applied per
(pred, target) pair inside the loss — not as a preprocessing step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.jitter import jitter_rotated_boxes, jitter_spherical_boxes
from ..geometry.sph2pob import sph2pob_efficient, sph2pob_legacy, sph2pob_standard

_TRANSFORMS = {
    "sph2pob_standard": sph2pob_standard,
    "sph2pob_efficient": sph2pob_efficient,
    "sph2pob_legacy": sph2pob_legacy,
}


def sph2pob_pairs(
    pred: jax.Array,
    target: jax.Array,
    transform: str = "sph2pob_standard",
) -> tuple[jax.Array, jax.Array]:
    """Spherical (deg, (..., 4|5)) -> rotated-box pairs (rad, (..., 5))."""
    pred, target = jitter_spherical_boxes(pred, target)
    pob_p, pob_t = _TRANSFORMS[transform](jnp.deg2rad(pred), jnp.deg2rad(target))
    return jitter_rotated_boxes(pob_p, pob_t)
