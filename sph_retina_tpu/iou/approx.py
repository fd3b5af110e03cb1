"""Planar approximate spherical IoUs: Sph-IoU and FoV-IoU.

Competitor baselines kept for capability parity with the reference
(/root/reference/sphdet/iou/approximate_ious.py). Axis-aligned rectangle
intersection in a longitude/latitude chart:

- Sph-IoU (AAAI'20 "Spherical criteria..."): raw chart coordinates.
- FoV-IoU (arXiv 2202.03176): longitude deltas rescaled by cos(mean latitude).

Boxes are (..., 4) in **degrees** (theta, phi, alpha, beta); callers should
apply :func:`standardize_spherical_box` first to avoid the seam (the API layer
does). Elementwise over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_convention_rad(boxes: jax.Array):
    """Degrees (theta in [0,360), phi colat) -> radians (lon in (-pi,pi), lat)."""
    b = jnp.deg2rad(boxes)
    lon = b[..., 0] - jnp.pi
    lat = jnp.pi / 2.0 - b[..., 1]
    return lon, lat, b[..., 2], b[..., 3]


def sph_iou_aligned(boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-8):
    lon1, lat1, a1, b1 = _to_convention_rad(boxes1)
    lon2, lat2, a2, b2 = _to_convention_rad(boxes2)

    x_min = jnp.maximum(lon1 - a1 / 2, lon2 - a2 / 2)
    x_max = jnp.minimum(lon1 + a1 / 2, lon2 + a2 / 2)
    y_min = jnp.maximum(lat1 - b1 / 2, lat2 - b2 / 2)
    y_max = jnp.minimum(lat1 + b1 / 2, lat2 + b2 / 2)

    inter = jnp.maximum(x_max - x_min, 0.0) * jnp.maximum(y_max - y_min, 0.0)
    union = a1 * b1 + a2 * b2 - inter
    return inter / (union + eps)


def fov_iou_aligned(boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-8):
    lon1, lat1, a1, b1 = _to_convention_rad(boxes1)
    lon2, lat2, a2, b2 = _to_convention_rad(boxes2)

    # FoV-space longitude offset of box2 relative to box1.
    delta = (lon2 - lon1) * jnp.cos((lat1 + lat2) / 2.0)
    x_min = jnp.maximum(-a1 / 2, delta - a2 / 2)
    x_max = jnp.minimum(a1 / 2, delta + a2 / 2)
    y_min = jnp.maximum(lat1 - b1 / 2, lat2 - b2 / 2)
    y_max = jnp.minimum(lat1 + b1 / 2, lat2 + b2 / 2)

    inter = jnp.maximum(x_max - x_min, 0.0) * jnp.maximum(y_max - y_min, 0.0)
    union = a1 * b1 + a2 * b2 - inter
    return inter / (union + eps)
