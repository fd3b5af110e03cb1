"""Box format conversions: spherical degrees <-> planar pixel/tangent charts.

Functional jnp rewrites of the reference "formators"
(/root/reference/sphdet/bbox/box_formator.py:17-224). All functions are
elementwise over leading axes; box layouts on the last axis:

- spherical (degrees): (theta, phi, alpha, beta[, gamma])
- planar xywh / xyxy:  pixel coordinates in an (img_h, img_w) ERP chart
- planar obb:          (cx, cy, w, h, angle_rad)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_IMG_SIZE = (512, 1024)  # (H, W) ERP chart used when only ratios matter


def xyxy2xywh(boxes: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(boxes: jax.Array) -> jax.Array:
    x, y, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], axis=-1)


def obb2hbb_xywh(obb: jax.Array) -> jax.Array:
    """Axis-aligned cover of a rotated box, xywh layout."""
    cx, cy, w, h, a = (obb[..., i] for i in range(5))
    cos_a, sin_a = jnp.abs(jnp.cos(a)), jnp.abs(jnp.sin(a))
    return jnp.stack(
        [cx, cy, cos_a * w + sin_a * h, sin_a * w + cos_a * h], axis=-1
    )


def obb2hbb_xyxy(obb: jax.Array) -> jax.Array:
    return xywh2xyxy(obb2hbb_xywh(obb))


def bfov2rbfov(bfov: jax.Array) -> jax.Array:
    """Append a zero rotation column: (..., 4) -> (..., 5)."""
    return jnp.concatenate([bfov, jnp.zeros_like(bfov[..., :1])], axis=-1)


def geo2sph(boxes: jax.Array) -> jax.Array:
    """Geographic (lon in [-180,180], lat in [90,-90]) -> internal degrees."""
    return boxes.at[..., 0].add(180.0).at[..., 1].set(90.0 - boxes[..., 1])


def sph2geo(boxes: jax.Array) -> jax.Array:
    return boxes.at[..., 0].add(-180.0).at[..., 1].set(90.0 - boxes[..., 1])


# --------------------------------------------------------------------------- #
# chart transforms (degrees <-> pixels)
# --------------------------------------------------------------------------- #
def sph2pix_box_transform(boxes, img_size=DEFAULT_IMG_SIZE):
    """Equirectangular chart: linear degree -> pixel scaling (xywh out)."""
    img_h, img_w = img_size
    t, p, a, b = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [t / 360.0 * img_w, p / 180.0 * img_h, a / 360.0 * img_w, b / 180.0 * img_h],
        axis=-1,
    )


def pix2sph_box_transform(boxes, img_size=DEFAULT_IMG_SIZE):
    img_h, img_w = img_size
    x, y, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [x / img_w * 360.0, y / img_h * 180.0, w / img_w * 360.0, h / img_h * 180.0],
        axis=-1,
    )


def sph2tan_box_transform(boxes, img_size=DEFAULT_IMG_SIZE):
    """Gnomonic sizes: extents become tangent-plane lengths (xywh out)."""
    img_h, img_w = img_size
    t, p, a, b = (boxes[..., i] for i in range(4))
    two_r = img_w / math.pi
    return jnp.stack(
        [
            t / 360.0 * img_w,
            p / 180.0 * img_h,
            two_r * jnp.tan(jnp.deg2rad(a) / 2.0),
            two_r * jnp.tan(jnp.deg2rad(b) / 2.0),
        ],
        axis=-1,
    )


def tan2sph_box_transform(boxes, img_size=DEFAULT_IMG_SIZE):
    img_h, img_w = img_size
    x, y, w, h = (boxes[..., i] for i in range(4))
    two_r = img_w / math.pi
    return jnp.stack(
        [
            x / img_w * 360.0,
            y / img_h * 180.0,
            jnp.rad2deg(2.0 * jnp.arctan(w / two_r)),
            jnp.rad2deg(2.0 * jnp.arctan(h / two_r)),
        ],
        axis=-1,
    )


_SPH2PLANAR = {"sph2pix": sph2pix_box_transform, "sph2tan": sph2tan_box_transform}
_PLANAR2SPH = {
    "sph2pix": pix2sph_box_transform,
    "pix2sph": pix2sph_box_transform,
    "sph2tan": tan2sph_box_transform,
    "tan2sph": tan2sph_box_transform,
}


def sph2planar_boxes(boxes, mode="sph2pix", img_size=DEFAULT_IMG_SIZE):
    """Spherical degrees -> planar boxes (Sph2PlanarBoxTransform parity).

    BFoV returns xyxy; RBFoV returns (x, y, w, h, -gamma_rad) obb.
    """
    transform = _SPH2PLANAR[mode]
    if boxes.shape[-1] == 4:
        return xywh2xyxy(transform(boxes, img_size))
    xywh = transform(boxes[..., :4], img_size)
    angle = -jnp.deg2rad(boxes[..., 4:5])
    return jnp.concatenate([xywh, angle], axis=-1)


def planar2sph_boxes(boxes, mode="sph2pix", box_version=4, img_size=DEFAULT_IMG_SIZE):
    """Planar xyxy -> spherical degrees (Planar2SphBoxTransform parity)."""
    transform = _PLANAR2SPH[mode]
    sph = transform(xyxy2xywh(boxes), img_size)
    if box_version == 5:
        return bfov2rbfov(sph)
    return sph
