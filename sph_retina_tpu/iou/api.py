"""Unified spherical-IoU API: one entry point, eight backends.

Reference parity with /root/reference/sphdet/iou/sph_iou_api.py:48-260 and
sph_iou_calculator.py:58-113, redesigned for XLA:

- every backend is a pure elementwise function over box pairs, so *aligned*
  (N,) and *pairwise* (N, M) modes are the same code under broadcasting —
  no repeat_interleave materialization;
- degrees at this boundary (like the reference), radians inside;
- results clamped to [0, 1].

Backends: ``sph2pob_efficient`` (default hot path), ``sph2pob_standard``,
``sph2pob_legacy``, ``unbiased`` (exact oracle, TPU-resident here),
``sph`` / ``fov`` (planar approximations), ``naive`` (chart IoU), and
``kent`` (Kent-distribution KLD surrogate).

For huge pairwise problems (anchor assignment: ~100k x K) prefer
``sph_retina_tpu.ops.sph2pob_iou_pairwise_tpu`` — the Pallas-tiled fused
kernel. This module does NOT dispatch to it automatically; the hot callers
that need it use it directly (``models/single_stage.py`` assignment,
``boxes/nms.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.boxes import standardize_spherical_box
from ..geometry.jitter import jitter_rotated_boxes, jitter_spherical_boxes
from ..geometry.sph2pob import sph2pob_efficient, sph2pob_legacy, sph2pob_standard
from ..boxes.formator import sph2planar_boxes
from .approx import fov_iou_aligned, sph_iou_aligned
from .rotated import rotated_box_iou
from .unbiased import unbiased_iou as _unbiased_elementwise

_TRANSFORMS = {
    "sph2pob_standard": sph2pob_standard,
    "sph2pob_efficient": sph2pob_efficient,
    "sph2pob_legacy": sph2pob_legacy,
}


def _sph2pob_iou_elementwise(
    boxes1, boxes2, *, variant: str, rbb_edge: str = "arc", rbb_angle: str = "equator"
):
    """Jitter -> Sph2Pob transform -> rotated IoU, boxes in degrees."""
    boxes1, boxes2 = jitter_spherical_boxes(boxes1, boxes2)
    if variant == "sph2pob_legacy":
        boxes1, boxes2 = standardize_spherical_box(boxes1, boxes2)
        pob1, pob2 = sph2pob_legacy(
            jnp.deg2rad(boxes1), jnp.deg2rad(boxes2), rbb_edge=rbb_edge
        )
    else:
        pob1, pob2 = _TRANSFORMS[variant](
            jnp.deg2rad(boxes1), jnp.deg2rad(boxes2),
            rbb_edge=rbb_edge, rbb_angle=rbb_angle,
        )
    pob1, pob2 = jitter_rotated_boxes(pob1, pob2)
    return rotated_box_iou(pob1, pob2)


def _unbiased_deg(boxes1, boxes2):
    boxes1, boxes2 = jitter_spherical_boxes(boxes1, boxes2)
    return _unbiased_elementwise(jnp.deg2rad(boxes1), jnp.deg2rad(boxes2))


def _sph_deg(boxes1, boxes2):
    boxes1, boxes2 = jitter_spherical_boxes(boxes1, boxes2)
    boxes1, boxes2 = standardize_spherical_box(boxes1, boxes2)
    return sph_iou_aligned(boxes1, boxes2)


def _fov_deg(boxes1, boxes2):
    boxes1, boxes2 = jitter_spherical_boxes(boxes1, boxes2)
    boxes1, boxes2 = standardize_spherical_box(boxes1, boxes2)
    return fov_iou_aligned(boxes1, boxes2)


def _aligned_boxes_iou_xyxy(b1, b2, eps=1e-8):
    """Axis-aligned xyxy IoU, elementwise."""
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1 + a2 - inter + eps)


def _naive_deg(boxes1, boxes2):
    """Planar-chart IoU of spherical boxes (naive_iou, sph_iou_api.py:182-199)."""
    if boxes1.shape[-1] == 4:
        return _aligned_boxes_iou_xyxy(
            sph2planar_boxes(boxes1), sph2planar_boxes(boxes2)
        )
    return rotated_box_iou(sph2planar_boxes(boxes1), sph2planar_boxes(boxes2))


def _kent_deg(boxes1, boxes2):
    from .kent import kent_iou_elementwise  # deferred: pulls in the Kent subsystem

    return kent_iou_elementwise(boxes1, boxes2)


_BACKENDS = {
    "sph2pob_standard": partial(_sph2pob_iou_elementwise, variant="sph2pob_standard"),
    "sph2pob_efficient": partial(_sph2pob_iou_elementwise, variant="sph2pob_efficient"),
    "sph2pob_legacy": partial(_sph2pob_iou_elementwise, variant="sph2pob_legacy"),
    "unbiased": _unbiased_deg,
    "sph": _sph_deg,
    "fov": _fov_deg,
    "naive": _naive_deg,
    "kent": _kent_deg,
}

# Reference config spellings (the `*_iou` function names of
# /root/reference/sphdet/iou/sph_iou_api.py:91-98 appear as backend strings
# in leaf configs, e.g. configs/retinanet/sph_retinanet_r50_fpn_120e_pandora.py:30).
# Every dispatch point canonicalizes first, so alias spellings hit the same
# fast paths (fused Pallas kernels) as the short names.
_ALIASES = {
    "sph2pob": "sph2pob_efficient",
    "sph2pob_standard_iou": "sph2pob_standard",
    "sph2pob_efficient_iou": "sph2pob_efficient",
    "sph2pob_legacy_iou": "sph2pob_legacy",
    "unbiased_iou": "unbiased",
    "sph_iou": "sph",
    "fov_iou": "fov",
    "naive_iou": "naive",
    "kent_iou": "kent",
}


def canonical_backend(name: str) -> str:
    """Resolve a backend name or reference-spelling alias to its canonical
    form (does not validate: unknown names pass through for the caller's
    error message)."""
    return _ALIASES.get(name, name)


BACKENDS = tuple(sorted(set(_BACKENDS) | set(_ALIASES)))


def sph_overlaps(
    boxes1: jax.Array,
    boxes2: jax.Array,
    backend: str = "sph2pob_efficient",
    is_aligned: bool = False,
    **kwargs,
) -> jax.Array:
    """Spherical IoU between box sets, degrees in.

    Args:
        boxes1: (N, 4|5) spherical boxes in degrees.
        boxes2: (M, 4|5); M == N required when ``is_aligned``.
        backend: one of :data:`BACKENDS`.
        is_aligned: elementwise (N,) if True, else pairwise (N, M).

    Returns:
        IoU in [0, 1]; float32.
    """
    backend = canonical_backend(backend)
    if backend not in _BACKENDS:
        raise ValueError(f"unknown IoU backend {backend!r}; choose from {BACKENDS}")
    fn = _BACKENDS[backend]
    boxes1 = jnp.asarray(boxes1, jnp.float32)
    boxes2 = jnp.asarray(boxes2, jnp.float32)
    if not is_aligned and backend.startswith("kent"):
        # Kent is a per-box parameterization: convert each side once and
        # broadcast the 5 parameters, instead of re-running the 121-point
        # moment estimation per pair.
        from .kent import deg2kent, kent_iou_from_params

        ka = deg2kent(boxes1)
        kb = deg2kent(boxes2)
        out = kent_iou_from_params(ka[:, None, :], kb[None, :, :])
    elif is_aligned:
        out = fn(boxes1, boxes2, **kwargs)
    else:
        n, m = boxes1.shape[0], boxes2.shape[0]
        b1 = jnp.broadcast_to(boxes1[:, None, :], (n, m, boxes1.shape[-1]))
        b2 = jnp.broadcast_to(boxes2[None, :, :], (n, m, boxes2.shape[-1]))
        out = fn(b1, b2, **kwargs)
    return jnp.clip(out, 0.0, 1.0)


# Convenience wrappers mirroring the reference's public functions
# (sph_iou_api.py:91-219).
def sph2pob_standard_iou(b1, b2, is_aligned=False, **kw):
    return sph_overlaps(b1, b2, "sph2pob_standard", is_aligned, **kw)


def sph2pob_efficient_iou(b1, b2, is_aligned=False, **kw):
    return sph_overlaps(b1, b2, "sph2pob_efficient", is_aligned, **kw)


def sph2pob_legacy_iou(b1, b2, is_aligned=False, **kw):
    return sph_overlaps(b1, b2, "sph2pob_legacy", is_aligned, **kw)


def unbiased_iou(b1, b2, is_aligned=False):
    return sph_overlaps(b1, b2, "unbiased", is_aligned)


def sph_iou(b1, b2, is_aligned=False):
    return sph_overlaps(b1, b2, "sph", is_aligned)


def fov_iou(b1, b2, is_aligned=False):
    return sph_overlaps(b1, b2, "fov", is_aligned)


def naive_iou(b1, b2, is_aligned=False):
    return sph_overlaps(b1, b2, "naive", is_aligned)


def kent_iou(b1, b2, is_aligned=False):
    return sph_overlaps(b1, b2, "kent", is_aligned)
