"""Differentiable rotated-rectangle IoU in pure jnp.

Fixed-size, branch-free polygon clipping: the intersection of two convex
quadrilaterals has at most 8 vertices drawn from a fixed candidate set of 24
(4 corners of each box + 16 edge-edge intersections). We mask invalid
candidates, order the valid ones by angle about their centroid, and evaluate
the shoelace formula with a gathered "cyclic next" index — everything static
shape, so XLA tiles it onto the VPU and `jax.grad` differentiates it directly
(no custom CUDA op as in the reference; algorithm semantics follow
/root/reference/sphdet/iou/diff_iou_rotated.py:20-343, which is itself the
public Rotated_IoU algorithm).

Shapes: boxes are (..., 5) = (cx, cy, w, h, angle_rad); all outputs drop the
last axis. Works under vmap/broadcasting for pairwise use; the Pallas kernel
in ``sph_retina_tpu.ops`` reuses these functions tile-by-tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-8


def box_corners(boxes: jax.Array) -> jax.Array:
    """Corners of rotated boxes, (..., 5) -> (..., 4, 2), CCW adjacency."""
    cx, cy, w, h, ang = (boxes[..., i] for i in range(5))
    dx = jnp.stack([w, -w, -w, w], axis=-1) * 0.5  # (..., 4)
    dy = jnp.stack([h, h, -h, -h], axis=-1) * 0.5
    cos, sin = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    x = cx[..., None] + dx * cos - dy * sin
    y = cy[..., None] + dx * sin + dy * cos
    return jnp.stack([x, y], axis=-1)


def _edge_intersections(c1: jax.Array, c2: jax.Array):
    """Pairwise segment intersections between box edges.

    Returns points (..., 4, 4, 2) and validity (..., 4, 4); invalid points are
    zeroed (zero value and zero gradient — the masking trick that keeps the
    candidate set fixed-size).
    """
    nxt = jnp.roll(jnp.arange(4), -1)
    p1, p2 = c1, c1[..., nxt, :]   # segment a: p1 -> p2, (..., 4, 2)
    p3, p4 = c2, c2[..., nxt, :]   # segment b: p3 -> p4

    # Broadcast to (..., 4a, 4b, 2)
    p1, p2 = p1[..., :, None, :], p2[..., :, None, :]
    p3, p4 = p3[..., None, :, :], p4[..., None, :, :]

    d1 = p2 - p1
    d2 = p4 - p3
    d13 = p1 - p3

    def cross2(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    # Solve p1 + t d1 = p3 + u d2 (cross both sides with d2 resp. d1).
    denom = cross2(d2, d1)
    t = cross2(d13, d2) / (denom + EPSILON)
    u = cross2(d13, d1) / (denom + EPSILON)
    valid = (denom != 0.0) & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
    pts = p1 + t[..., None] * d1
    return pts * valid[..., None], valid


def _corners_in_box(corners: jax.Array, box_corners_: jax.Array) -> jax.Array:
    """(..., 4) mask: which corners of one box lie inside the other (closed)."""
    a = box_corners_[..., 0:1, :]
    ab = box_corners_[..., 1:2, :] - a
    ad = box_corners_[..., 3:4, :] - a
    am = corners - a
    p_ab = jnp.sum(ab * am, axis=-1)
    p_ad = jnp.sum(ad * am, axis=-1)
    n_ab = jnp.sum(ab * ab, axis=-1)
    n_ad = jnp.sum(ad * ad, axis=-1)
    return (p_ab >= 0) & (p_ab <= n_ab) & (p_ad >= 0) & (p_ad <= n_ad)


def _dedup_coincident(c1, c2, in1, in2):
    """Keep only one copy of exactly-coincident corners of the two boxes.

    Without this the shoelace polygon would contain duplicated vertices
    (reference check_overlap, diff_iou_rotated.py:196-223). Pure bookkeeping
    on masks — wrapped in stop_gradient by the caller's masks being boolean.
    """
    r_c2, r_in2 = c2, in2
    for _ in range(4):
        r_c2 = jnp.roll(r_c2, 1, axis=-2)
        r_in2 = jnp.roll(r_in2, 1, axis=-1)
        coincide = jnp.all(c1 == r_c2, axis=-1)
        in1 = in1 | coincide
        r_in2 = r_in2 & ~coincide
    return in1, r_in2  # r_in2 rolled 4x == aligned with c2 again


def _masked_polygon_area(vertices: jax.Array, mask: jax.Array) -> jax.Array:
    """Area of the convex polygon formed by masked candidate vertices.

    vertices: (..., K, 2) candidates with invalid entries zeroed;
    mask: (..., K) validity. Sorts valid vertices by angle about their
    centroid, then runs the shoelace sum with a cyclic-next gather so the
    wrap-around edge needs no dynamic scatter.
    """
    K = vertices.shape[-2]
    num_valid = jnp.sum(mask, axis=-1)  # (...,)
    fmask = mask[..., None].astype(vertices.dtype)
    mean = jnp.sum(vertices * fmask, axis=-2, keepdims=True) / jnp.maximum(
        num_valid[..., None, None], 1
    ).astype(vertices.dtype)
    centered = vertices - mean

    # Invalid slots get angle ~ +pi so they sort last (same trick as the
    # reference: x=-1e6, y=+1e-6).
    x = jnp.where(mask, centered[..., 0], -1e6)
    y = jnp.where(mask, centered[..., 1], 1e-6)
    ang = jnp.arctan2(y, x)
    order = jax.lax.stop_gradient(jnp.argsort(ang, axis=-1))  # (..., K)
    sorted_v = jnp.take_along_axis(centered, order[..., None], axis=-2)

    idx = jnp.arange(K)
    idx = jnp.broadcast_to(idx, mask.shape)
    nxt = jnp.where(idx + 1 < num_valid[..., None], idx + 1, 0)
    v_next = jnp.take_along_axis(sorted_v, nxt[..., None], axis=-2)

    contrib = (
        sorted_v[..., 0] * v_next[..., 1] - sorted_v[..., 1] * v_next[..., 0]
    )
    contrib = jnp.where(idx < num_valid[..., None], contrib, 0.0)
    area = jnp.abs(jnp.sum(contrib, axis=-1)) * 0.5
    return jnp.where(num_valid >= 3, area, 0.0)


def rotated_box_intersection(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Intersection area from corner arrays (..., 4, 2)."""
    pts, pts_valid = _edge_intersections(c1, c2)
    in1 = _corners_in_box(c1, c2)
    in2 = _corners_in_box(c2, c1)
    in1, in2 = _dedup_coincident(c1, c2, in1, in2)
    lead = pts.shape[:-3]  # broadcasted leading shape
    c1 = jnp.broadcast_to(c1, lead + (4, 2))
    c2 = jnp.broadcast_to(c2, lead + (4, 2))
    in1 = jnp.broadcast_to(in1, lead + (4,))
    in2 = jnp.broadcast_to(in2, lead + (4,))
    vertices = jnp.concatenate(
        [c1, c2, pts.reshape(lead + (16, 2))], axis=-2
    )  # (..., 24, 2)
    mask = jnp.concatenate([in1, in2, pts_valid.reshape(lead + (16,))], axis=-1)
    return _masked_polygon_area(vertices, mask)


def rotated_box_iou(pob1: jax.Array, pob2: jax.Array, eps: float = 0.0) -> jax.Array:
    """Elementwise IoU of rotated boxes (..., 5) -> (...). Differentiable."""
    inter = rotated_box_intersection(box_corners(pob1), box_corners(pob2))
    area1 = pob1[..., 2] * pob1[..., 3]
    area2 = pob2[..., 2] * pob2[..., 3]
    union = area1 + area2 - inter
    return inter / (union + eps)
