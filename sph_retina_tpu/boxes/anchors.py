"""Spherical anchor generation.

Planar grid anchors (mmdet semantics: base anchors from strides/ratios/
scales or octave scales, shifted over the feature grid —
/root/reference/mmdet/core/anchor/anchor_generator.py:131-281) converted
pixel -> spherical degrees per FPN level
(/root/reference/sphdet/bbox/anchor/sph_anchor_generator.py:43-57; we use the
BFoV/RBFoV conversion the reference's commented-out line 36 intended — its
line 39 unconditionally emits Kent anchors, a fork bug SURVEY.md flags).

Anchors are deterministic constants per (config, featmap sizes): generated
host-side with numpy once and embedded as jit constants, so XLA folds them —
no device computation per step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SphAnchorGenerator:
    """BFoV/RBFoV anchor generator.

    Attributes mirror the reference config surface
    (configs/_base_/models/sph_retinanet_r50_fpn.py:27-33).
    """

    strides: Sequence[int]
    ratios: Sequence[float] = (0.5, 1.0, 2.0)
    scales: Sequence[float] | None = None
    octave_base_scale: int | None = None
    scales_per_octave: int | None = None
    base_sizes: Sequence[int] | None = None
    center_offset: float = 0.0
    box_version: int = 4
    box_formator: str = "sph2pix"

    def _scales(self) -> np.ndarray:
        if self.scales is not None:
            return np.asarray(self.scales, np.float32)
        octaves = np.array(
            [2 ** (i / self.scales_per_octave) for i in range(self.scales_per_octave)]
        )
        return (octaves * self.octave_base_scale).astype(np.float32)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self._scales())

    def base_anchors(self, level: int) -> np.ndarray:
        """(A, 4) xyxy planar base anchors for one level."""
        base_size = (
            self.base_sizes[level] if self.base_sizes is not None
            else self.strides[level]
        )
        scales = self._scales()
        ratios = np.asarray(self.ratios, np.float32)
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        ws = (base_size * w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (base_size * h_ratios[:, None] * scales[None, :]).reshape(-1)
        cx = self.center_offset * base_size
        cy = self.center_offset * base_size
        return np.stack(
            [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs], axis=-1
        ).astype(np.float32)

    def single_level_grid_anchors(self, featmap_size, level: int) -> np.ndarray:
        """(H*W*A, box_version) spherical anchors in degrees."""
        feat_h, feat_w = featmap_size
        stride = self.strides[level]
        shift_x = np.arange(feat_w, dtype=np.float32) * stride
        shift_y = np.arange(feat_h, dtype=np.float32) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)  # (K, 4)
        planar = (self.base_anchors(level)[None, :, :] + shifts[:, None, :]).reshape(-1, 4)

        img_h, img_w = feat_h * stride, feat_w * stride
        sph = self._planar2sph(planar, (img_h, img_w))
        if self.box_version == 5:
            sph = np.concatenate([sph, np.zeros_like(sph[:, :1])], axis=-1)
        return sph

    def _planar2sph(self, xyxy: np.ndarray, img_size) -> np.ndarray:
        img_h, img_w = img_size
        x = (xyxy[:, 0] + xyxy[:, 2]) / 2.0
        y = (xyxy[:, 1] + xyxy[:, 3]) / 2.0
        w = xyxy[:, 2] - xyxy[:, 0]
        h = xyxy[:, 3] - xyxy[:, 1]
        if self.box_formator in ("sph2pix", "pix2sph"):
            alpha = w / img_w * 360.0
            beta = h / img_h * 180.0
        else:  # tangent-plane sizes (sph2tan/tan2sph)
            two_r = img_w / math.pi
            alpha = np.rad2deg(2.0 * np.arctan(w / two_r))
            beta = np.rad2deg(2.0 * np.arctan(h / two_r))
        theta = x / img_w * 360.0
        phi = y / img_h * 180.0
        return np.stack([theta, phi, alpha, beta], axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[tuple]) -> list:
        """Per-level spherical anchors as jnp constants."""
        assert len(featmap_sizes) == self.num_levels
        return [
            jnp.asarray(self.single_level_grid_anchors(fs, i))
            for i, fs in enumerate(featmap_sizes)
        ]

    def flat_anchors(self, featmap_sizes) -> jnp.ndarray:
        """All levels concatenated: (sum_l H_l*W_l*A, box_version)."""
        return jnp.concatenate(self.grid_anchors(featmap_sizes), axis=0)


def kent_grid_anchors(generator: "SphAnchorGenerator", featmap_sizes):
    """Per-level grid anchors as canonical Kent parameters.

    Parity with the reference's KentAnchorGenerator
    (sphdet/bbox/anchor/kent_anchor_generator.py:26): planar grid anchors
    converted pixel->spherical->Kent. Design decision (SURVEY.md §7
    "reference bugs not to replicate"): the reference fork hijacked
    SphAnchorGenerator to emit Kent anchors *unconditionally*
    (sph_anchor_generator.py:39), breaking every non-Kent config; here
    detectors always consume spherical anchors, and Kent-space anchors are
    an explicit precomputation for Kent assignment/loss paths.
    """
    from ..iou.kent import deg2kent

    return [deg2kent(a) for a in generator.grid_anchors(featmap_sizes)]


@dataclasses.dataclass(frozen=True)
class SphSSDAnchorGenerator(SphAnchorGenerator):
    """SSD-style anchors: per-level min/max sizes + ratio set.

    Reference: sphdet/bbox/anchor/sph_ssd_anchor_generator.py:9 subclasses
    mmdet SSDAnchorGenerator; base anchors are (min_size, sqrt(min*max)) at
    ratio 1 plus min_size at each extra ratio (and its inverse).
    """

    min_sizes: Sequence[float] = ()
    max_sizes: Sequence[float] = ()
    level_ratios: Sequence[Sequence[float]] = ()

    @property
    def num_base_anchors(self):  # varies by level; use per-level helper
        raise AttributeError("use num_base_anchors_per_level")

    @property
    def num_base_anchors_per_level(self):
        return [2 + 2 * len(r) for r in self.level_ratios]

    def base_anchors(self, level: int) -> np.ndarray:
        mn, mx = self.min_sizes[level], self.max_sizes[level]
        ws = [mn, math.sqrt(mn * mx)]
        hs = [mn, math.sqrt(mn * mx)]
        for r in self.level_ratios[level]:
            sr = math.sqrt(r)
            ws += [mn * sr, mn / sr]
            hs += [mn / sr, mn * sr]
        ws = np.asarray(ws, np.float32)
        hs = np.asarray(hs, np.float32)
        cx = cy = self.center_offset * self.strides[level]
        return np.stack(
            [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs], axis=-1
        ).astype(np.float32)
