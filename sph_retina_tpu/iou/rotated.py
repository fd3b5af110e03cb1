"""Differentiable rotated-rectangle IoU in pure jnp — sort-free, fusion-first.

Intersection of two convex quadrilaterals by Sutherland–Hodgman clipping,
re-expressed branch-free for the TPU VPU: clip box1 successively by the 4
half-planes of box2. The classical algorithm emits a variable number of
vertices per stage; instead every input edge emits **exactly two** points:

- both endpoints inside:   (cur, nxt)
- crossing:                (cur, I) or (I, nxt)
- both outside:            (proj(cur), proj(nxt)) — projections onto the
                           clip line.

Duplicated vertices contribute nothing to the shoelace sum, and signed areas
of collinear chords along the clip line are additive regardless of ordering,
so the emitted 2x-size polygon has *exactly* the clipped area — no masks, no
compaction, no sort, no gather. Stage sizes 4 -> 8 -> 16 -> 32 -> 64.

The polygon is held as a Python list of per-vertex (x, y) coordinate arrays
rather than a stacked (..., K, 2) tensor: the whole pipeline is then a DAG of
elementwise ops on identically-shaped arrays with **zero layout operations**
(no roll/stack/reshape on the vertex axis), which XLA fuses into a single
kernel — intermediates never touch HBM. A stacked formulation of the same
math runs ~10x slower because each roll/stack materializes a (..., K, 2)
buffer. ``jax.grad`` differentiates the whole thing directly.

(The reference computes the same IoU via mmcv's CUDA 24-candidate + argsort
kernel — box_iou_rotated / diff_iou_rotated_2d; see
/root/reference/sphdet/iou/diff_iou_rotated.py for its algorithm. Both an
argsort formulation and a stacked clip are far off the VPU roofline on TPU,
hence this redesign.)

Shapes: boxes are (..., 5) = (cx, cy, w, h, angle_rad); broadcasting over
leading axes works, so the pairwise (N, M) case is the same code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-12


def box_corners(boxes: jax.Array) -> jax.Array:
    """Corners of rotated boxes, (..., 5) -> (..., 4, 2), CCW order."""
    pts = _corner_list(boxes[..., 0], boxes[..., 1], boxes[..., 2],
                       boxes[..., 3], boxes[..., 4])
    return jnp.stack([jnp.stack(p, axis=-1) for p in pts], axis=-2)


def _corner_list(cx, cy, w, h, ang):
    """CCW corners as a list of 4 (x, y) tuples of (...,) arrays."""
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    hw, hh = w * 0.5, h * 0.5
    pts = []
    for sx, sy in ((1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)):
        dx, dy = sx * hw, sy * hh
        pts.append((cx + dx * cos - dy * sin, cy + dx * sin + dy * cos))
    return pts


def _clip_halfplane_unrolled(pts, ax, ay, bx, by):
    """Clip polygon (list of (x, y)) by the half-plane left of (a)->(b).

    Returns a list of length 2*len(pts). Pure elementwise ops.
    """
    dx, dy = bx - ax, by - ay
    inv_dd = 1.0 / jnp.maximum(dx * dx + dy * dy, EPSILON)

    sides = [dx * (py - ay) - dy * (px - ax) for px, py in pts]

    out = []
    n = len(pts)
    for i in range(n):
        (cx_, cy_), s_cur = pts[i], sides[i]
        (nx_, ny_), s_nxt = pts[(i + 1) % n], sides[(i + 1) % n]

        den = s_cur - s_nxt
        den = jnp.where(jnp.abs(den) < EPSILON, EPSILON, den)
        t = s_cur / den
        ix = cx_ + t * (nx_ - cx_)
        iy = cy_ + t * (ny_ - cy_)

        # Projections onto the clip line: p - s * perp(d) / |d|^2.
        pcx = cx_ + s_cur * dy * inv_dd
        pcy = cy_ - s_cur * dx * inv_dd
        pnx = nx_ + s_nxt * dy * inv_dd
        pny = ny_ - s_nxt * dx * inv_dd

        cur_in = s_cur >= 0.0
        nxt_in = s_nxt >= 0.0
        out.append((
            jnp.where(cur_in, cx_, jnp.where(nxt_in, ix, pcx)),
            jnp.where(cur_in, cy_, jnp.where(nxt_in, iy, pcy)),
        ))
        out.append((
            jnp.where(nxt_in, nx_, jnp.where(cur_in, ix, pnx)),
            jnp.where(nxt_in, ny_, jnp.where(cur_in, iy, pny)),
        ))
    return out


def _shoelace(pts):
    n = len(pts)
    total = None
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        c = x0 * y1 - y0 * x1
        total = c if total is None else total + c
    return 0.5 * total


def _intersection_from_components(b1, b2):
    """Intersection area from box components; inputs are 5-tuples of (...,)
    arrays (cx, cy, w, h, ang) already broadcast to a common shape."""
    poly = _corner_list(*b1)
    clip = _corner_list(*b2)
    for k in range(4):
        (ax, ay), (bx, by) = clip[k], clip[(k + 1) % 4]
        poly = _clip_halfplane_unrolled(poly, ax, ay, bx, by)
    # CCW input + left-of clipping keeps orientation; clamp stray negatives
    # from fully-clipped degenerate chains.
    return jnp.maximum(_shoelace(poly), 0.0)


def _components(boxes):
    return tuple(boxes[..., i] for i in range(5))


def rotated_box_intersection(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Intersection area from CCW corner arrays (..., 4, 2)."""
    lead = jnp.broadcast_shapes(c1.shape[:-2], c2.shape[:-2])
    c1 = jnp.broadcast_to(c1, lead + (4, 2))
    c2 = jnp.broadcast_to(c2, lead + (4, 2))
    poly = [(c1[..., i, 0], c1[..., i, 1]) for i in range(4)]
    clip = [(c2[..., i, 0], c2[..., i, 1]) for i in range(4)]
    for k in range(4):
        (ax, ay), (bx, by) = clip[k], clip[(k + 1) % 4]
        poly = _clip_halfplane_unrolled(poly, ax, ay, bx, by)
    return jnp.maximum(_shoelace(poly), 0.0)


def rotated_box_iou(pob1: jax.Array, pob2: jax.Array, eps: float = 0.0) -> jax.Array:
    """Elementwise IoU of rotated boxes (..., 5) -> (...). Differentiable."""
    b1 = _components(pob1)
    b2 = _components(pob2)
    shape = jnp.broadcast_shapes(b1[0].shape, b2[0].shape)
    b1 = tuple(jnp.broadcast_to(v, shape) for v in b1)
    b2 = tuple(jnp.broadcast_to(v, shape) for v in b2)
    inter = _intersection_from_components(b1, b2)
    area1 = jnp.abs(b1[2] * b1[3])
    area2 = jnp.abs(b2[2] * b2[3])
    union = area1 + area2 - inter
    return inter / (union + eps)
