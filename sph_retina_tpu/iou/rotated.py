"""Differentiable rotated-rectangle IoU in pure jnp — sort-free, fusion-first.

Two branch-free formulations, both DAGs of elementwise ops that XLA/Mosaic
fuse completely:

1. **Green's-theorem boundary integral** (``intersection_greens_cs``, used
   by the fused spherical pipeline / Pallas kernels, whose jitter
   guarantees non-degenerate pairs): each of the 8 box edges clipped
   against the *other* box is a 1-D parameter-interval clamp in that box's
   axis-aligned frame, and the intersection area is the order-free sum of
   per-segment shoelace cross terms. Linear cost in edges.

2. **Sort-free 2x-emit Sutherland–Hodgman** (``rotated_box_iou`` /
   ``rotated_box_intersection`` — the public entries, exact on symmetric
   inputs like identical or grid-adjacent boxes): clip box1 successively by
   the 4 half-planes of box2. The classical algorithm emits a variable
   number of vertices per stage; instead every input edge emits **exactly
   two** points:

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


def _corner_list_cs(cx, cy, w, h, cos, sin):
    """CCW corners from (cos, sin) orientation — no trig."""
    hw, hh = w * 0.5, h * 0.5
    pts = []
    for sx, sy in ((1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)):
        dx, dy = sx * hw, sy * hh
        pts.append((cx + dx * cos - dy * sin, cy + dx * sin + dy * cos))
    return pts


def _corner_list(cx, cy, w, h, ang):
    """CCW corners as a list of 4 (x, y) tuples of (...,) arrays."""
    return _corner_list_cs(cx, cy, w, h, jnp.cos(ang), jnp.sin(ang))


_BIG = 1e30
_DIV_EPS = 1e-12


def _edge_sum_greens(corners_w, other):
    """Sum of shoelace cross terms of one box's edges clipped to the other.

    ``corners_w``: 4 CCW world-frame (x, y) corner tuples of box P.
    ``other``: 6-tuple (cx, cy, w, h, cos, sin) of box Q.

    Each directed P edge u->v restricted to Q is a 1-D parameter interval:
    in Q's axis-aligned frame the four half-plane constraints become two
    x-bounds and two y-bounds on t, so the clip is 2 guarded reciprocals +
    min/max — no polygon growth. The segment's contribution to the boundary
    integral (1/2)oint(x dy - y dx) is evaluated on *world-frame* points
    (cross products are origin-dependent, so all contributions must share
    one frame; t itself is frame-invariant).
    """
    cxq, cyq, wq, hq, cq, sq = other
    a, b = wq * 0.5, hq * 0.5

    # P corners in Q's frame (rotate by -angle_Q about Q's center).
    fx, fy = [], []
    for x, y in corners_w:
        rx, ry = x - cxq, y - cyq
        fx.append(rx * cq + ry * sq)
        fy.append(ry * cq - rx * sq)

    acc = None
    for i in range(4):
        j = (i + 1) % 4
        ux, uy = corners_w[i]
        vx, vy = corners_w[j]
        dxw, dyw = vx - ux, vy - uy
        uxf, uyf = fx[i], fy[i]
        dxf, dyf = fx[j] - uxf, fy[j] - uyf

        def axis_bounds(u0, d0, half):
            safe = jnp.where(jnp.abs(d0) > _DIV_EPS, d0, _DIV_EPS)
            inv = 1.0 / safe
            t1 = (half - u0) * inv
            t2 = (-half - u0) * inv
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            # |d| ~ 0: constraint is t-independent — feasible iff |u| <= half
            mid = jnp.abs(d0) <= _DIV_EPS
            feas = jnp.abs(u0) <= half
            lo = jnp.where(mid, jnp.where(feas, -_BIG, _BIG), lo)
            hi = jnp.where(mid, jnp.where(feas, _BIG, -_BIG), hi)
            return lo, hi

        lox, hix = axis_bounds(uxf, dxf, a)
        loy, hiy = axis_bounds(uyf, dyf, b)
        # Both bounds clamped into [0, 1] BEFORE the empty-interval collapse:
        # a collapse point far off the segment (t ~ 1e4) would put p == q at
        # O(1e4) coordinates, where XLA's FMA contraction of px*qy - py*qx
        # leaves O(|p|^2 * eps_f32) ~ O(10) residue instead of exact zero.
        t_lo = jnp.minimum(jnp.maximum(jnp.maximum(lox, loy), 0.0), 1.0)
        t_hi = jnp.minimum(jnp.minimum(hix, hiy), 1.0)
        t_hi = jnp.maximum(t_hi, t_lo)  # empty -> zero-length -> ~0

        px = ux + t_lo * dxw
        py = uy + t_lo * dyw
        qx = ux + t_hi * dxw
        qy = uy + t_hi * dyw
        c = px * qy - py * qx
        acc = c if acc is None else acc + c
    return acc


def intersection_greens_cs(p1, p2):
    """Intersection area of two rotated rectangles via the boundary integral.

    area(P cap Q) = (1/2) * [sum over P edges clipped to Q + sum over Q edges
    clipped to P] of cross(start, end): the clipped sub-segments tile the
    boundary of the (convex) intersection exactly once, and shoelace terms
    are order-free. Cost is linear in the 8 edges — no 4->8->16->32->64
    polygon doubling like successive half-plane clipping (~6x faster in the
    Pallas kernel, and differentiable the same way).

    Caveat: a boundary run shared *exactly* (bitwise-collinear edges —
    identical boxes, touching grid cells) is traversed by both boxes and
    counted twice. Callers must jitter degenerate pairs first (the fused
    spherical pipeline does) and should bound the result by each box area.

    ``p1``, ``p2``: 6-tuples (cx, cy, w, h, cos, sin) of broadcast-compatible
    arrays.
    """
    c1 = _corner_list_cs(*p1)
    c2 = _corner_list_cs(*p2)
    total = _edge_sum_greens(c1, p2) + _edge_sum_greens(c2, p1)
    return jnp.maximum(0.5 * total, 0.0)


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
    arrays (cx, cy, w, h, ang) already broadcast to a common shape.

    Uses the 2x-emit clip, NOT the Green's form: exactly-collinear shared
    boundaries (identical boxes, axis-aligned grid neighbours) are counted
    once here but twice by the boundary integral. The fused spherical
    pipeline jitters every pair first, so it takes the cheaper Green's path;
    this public entry must stay exact on symmetric inputs."""
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
    # Two zero-area boxes give 0/0 = NaN, which then defeats NMS suppression
    # (NaN > thr is False, so mutually-degenerate duplicates all survive).
    # Define IoU = 0 there; the safe-where denominator keeps grads finite.
    ok = union > 0.0
    return jnp.where(ok, inter / jnp.where(ok, union + eps, 1.0), 0.0)
