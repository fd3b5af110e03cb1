"""Box coders: delta encode/decode in spherical degrees.

Reference parity:
- DeltaXYWHSphBBoxCoder (sphdet/bbox/coder/delta_xywh_sph_bbox_coder.py:
  bbox2delta:117-161, delta2bbox:165-262): dx,dy normalized by the anchor's
  FoV, log dw/dh, decode clamps to the open chenbin ranges.
- DeltaXYWHASphBBoxCoder (delta_xywha_rsph_bbox_coder.py): adds the rotation
  delta, encoded deg->rad and decoded rad->deg, gamma clamped to (-90, 90).
- The fork's "KentCoder" (kent_coder.py:12) is byte-identical 5-dof delta
  coding (it never touches true Kent parameters); ``SphBBoxCoder(
  box_version=5)`` therefore covers it.

Pure functions over (..., D) arrays; means/stds follow mmdet conventions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

_EPS = 1e-7


@dataclasses.dataclass(frozen=True)
class SphBBoxCoder:
    """Delta coder for BFoV (4) and RBFoV/Kent (5) spherical boxes."""

    box_version: int = 4
    target_means: Sequence[float] | None = None
    target_stds: Sequence[float] | None = None
    wh_ratio_clip: float = 16.0 / 1000.0
    clip_border: bool = True

    def _means_stds(self):
        d = self.box_version
        means = self.target_means if self.target_means is not None else (0.0,) * d
        stds = self.target_stds if self.target_stds is not None else (1.0,) * d
        return (jnp.asarray(means, jnp.float32), jnp.asarray(stds, jnp.float32))

    def encode(self, anchors: jax.Array, gt: jax.Array) -> jax.Array:
        """Deltas of gt w.r.t. anchors; both (..., box_version) degrees."""
        means, stds = self._means_stds()
        px, py = anchors[..., 0], anchors[..., 1]
        pw = jnp.maximum(anchors[..., 2], _EPS)
        ph = jnp.maximum(anchors[..., 3], _EPS)
        gw = jnp.maximum(gt[..., 2], _EPS)
        gh = jnp.maximum(gt[..., 3], _EPS)
        cols = [
            (gt[..., 0] - px) / pw,
            (gt[..., 1] - py) / ph,
            jnp.log(gw / pw),
            jnp.log(gh / ph),
        ]
        if self.box_version == 5:
            cols.append(jnp.deg2rad(gt[..., 4] - anchors[..., 4]))
        deltas = jnp.stack(cols, axis=-1)
        return (deltas - means) / stds

    def decode(self, anchors: jax.Array, deltas: jax.Array) -> jax.Array:
        """Apply deltas to anchors -> spherical boxes (degrees, clamped)."""
        means, stds = self._means_stds()
        d = deltas * stds + means
        max_ratio = abs(math.log(self.wh_ratio_clip))
        dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
        theta = anchors[..., 0] + anchors[..., 2] * d[..., 0]
        phi = anchors[..., 1] + anchors[..., 3] * d[..., 1]
        alpha = anchors[..., 2] * jnp.exp(dw)
        beta = anchors[..., 3] * jnp.exp(dh)
        cols = [theta, phi, alpha, beta]
        if self.box_version == 5:
            cols.append(anchors[..., 4] + jnp.rad2deg(d[..., 4]))
        boxes = jnp.stack(cols, axis=-1)
        if self.clip_border:
            lo = [_EPS, _EPS, _EPS, _EPS]
            hi = [360.0 - _EPS, 180.0 - _EPS, 180.0 - _EPS, 180.0 - _EPS]
            if self.box_version == 5:
                lo.append(-90.0 + _EPS)
                hi.append(90.0 - _EPS)
            boxes = jnp.clip(boxes, jnp.asarray(lo), jnp.asarray(hi))
        return boxes


@dataclasses.dataclass(frozen=True)
class DistancePointSphBBoxCoder:
    """FCOS-style coder: spherical box <-> (l, t, r, b) pixel distances.

    Reference sphdet/bbox/coder/distance_point_sph_bbox_coder.py:8-60:
    boxes convert sph->pixel-plane xyxy in a fixed ERP chart, distances are
    measured there, and decode maps back to spherical degrees.
    """

    img_size: tuple = (512, 1024)  # (H, W) chart
    box_version: int = 4

    def _scale(self):
        img_h, img_w = self.img_size
        return img_w / 360.0, img_h / 180.0

    def encode(self, points: jax.Array, gt: jax.Array, max_dis=None, eps=0.1):
        """points: (..., 2) pixel centers; gt: (..., 4) spherical degrees."""
        sx, sy = self._scale()
        cx, cy = gt[..., 0] * sx, gt[..., 1] * sy
        w, h = gt[..., 2] * sx, gt[..., 3] * sy
        left = points[..., 0] - (cx - w / 2)
        top = points[..., 1] - (cy - h / 2)
        right = (cx + w / 2) - points[..., 0]
        bottom = (cy + h / 2) - points[..., 1]
        d = jnp.stack([left, top, right, bottom], axis=-1)
        if max_dis is not None:
            d = jnp.clip(d, 0.0, max_dis - eps)
        return d

    def decode(self, points: jax.Array, distances: jax.Array) -> jax.Array:
        sx, sy = self._scale()
        x1 = points[..., 0] - distances[..., 0]
        y1 = points[..., 1] - distances[..., 1]
        x2 = points[..., 0] + distances[..., 2]
        y2 = points[..., 1] + distances[..., 3]
        theta = (x1 + x2) / 2.0 / sx
        phi = (y1 + y2) / 2.0 / sy
        alpha = (x2 - x1) / sx
        beta = (y2 - y1) / sy
        boxes = jnp.stack([theta, phi, alpha, beta], axis=-1)
        lo = jnp.asarray([_EPS] * 4)
        hi = jnp.asarray([360.0 - _EPS, 180.0 - _EPS, 180.0 - _EPS, 180.0 - _EPS])
        return jnp.clip(boxes, lo, hi)
