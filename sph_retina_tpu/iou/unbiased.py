"""Unbiased (exact) spherical-rectangle IoU — TPU-resident oracle.

Exact IoU of two spherical rectangles: each boundary is a great-circle arc
(every boundary plane passes through the origin), each box contributes 4
plane normals; the intersection region is the set of unit vectors inside all
8 half-spaces — a geodesically convex spherical polygon. Its vertices are
original box corners plus pairwise boundary-circle intersections, filtered
by an inside-all-8-planes test.

The reference implementation (sphdet/iou/unbiased_iou_bfov.py, numpy,
CPU-only, 46 s / 1M pairs) uses data-dependent shapes (np.where + bincount +
per-pair loops) and sums interior angles (Gauss–Bonnet spherical excess).
Here the candidate set is a fixed 40-element mask (4 + 4 corners, 16 + 16
cross-intersections) and the area is computed by a **centroid fan** instead
of the excess sum: sort the valid vertices by angle around their normalized
centroid (inside the region, by convexity) and accumulate signed l'Huilier
triangle areas (atan2 form). This is robust by construction where the
excess sum needs fragile per-vertex bookkeeping:

- duplicate vertices (identical boxes, a corner grazing the other box's
  boundary within fp tolerance) yield zero-area triangles instead of a
  spurious (angle - pi) excess term;
- tangency points (a plane touching the polygon at one point — e.g. the
  shared-plane containment class where the reference fp64 oracle returns
  garbage, even negative) land on the polygon boundary and contribute zero;
- genuinely distinct cut-corner vertex pairs arbitrarily close together
  (a box corner strictly inside the other box by ~1e-5 rad next to the edge
  crossing) are each counted with their true triangle — the round-2
  structural dedup dropped one of the pair inside its 1e-4 coincidence
  radius and corrupted the area by the missing turning angle (caught by the
  differential fuzz vs the reference oracle, round 3).

The whole computation is one fused elementwise XLA program over the 40-lane
candidate axis plus a single (stable) lax.sort — batched, differentiable
where meaningful, and fast enough to serve as a same-device oracle in tests,
benchmarks, and as an NMS backend.

Input boxes are (..., 4|5) in **radians**: (theta, phi, fov_x, fov_y[, gamma]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes import normalize, spherical_box_area

# Inside-plane tolerance. The reference (fp64) rounds dots to 8 decimals; in
# fp32 on TPU the on-plane dot noise is ~1e-7, so the tolerance must sit above
# it but below the smallest genuine inside-margin. Empirically the error
# plateau vs an fp64 oracle is flat (max err < 1e-4 over 10k random pairs) for
# tol in [3e-7, 1e-5]; 1e-6 is its midpoint. (The centroid fan only uses the
# tolerance to admit vertices; near-boundary false admits contribute
# near-zero triangles, so the plateau is even flatter than for the excess
# formulation.)
_TOL = 1e-6


def _rodrigues(axis: jax.Array, v: jax.Array, gamma: jax.Array) -> jax.Array:
    """Rotate v about unit axis by gamma (unbiased_iou_rbfov.py:10-32)."""
    cg = jnp.cos(gamma)[..., None]
    sg = jnp.sin(gamma)[..., None]
    return (
        v * cg
        + jnp.cross(axis, v) * sg
        + axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1.0 - cg)
    )


def _box_planes_and_corners(boxes: jax.Array):
    """Boundary plane normals (..., 4, 3), corner vertices (..., 4, 3) and the
    plane-pair index (corner i lies on planes PAIRS[i]).

    Normal order: [left, right, up, down]; a point is inside the box iff its
    dot product with every rotated normal-derived corner plane is >= 0
    (reference getNormal, unbiased_iou_bfov.py:14-43).
    """
    theta, phi = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 2] / 2.0, boxes[..., 3] / 2.0

    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    look = jnp.stack([sp * ct, sp * st, cp], axis=-1)
    right = jnp.stack([-st, ct, jnp.zeros_like(st)], axis=-1)
    up = jnp.stack([-cp * ct, -cp * st, sp], axis=-1)

    shx, chx = jnp.sin(hx)[..., None], jnp.cos(hx)[..., None]
    shy, chy = jnp.sin(hy)[..., None], jnp.cos(hy)[..., None]
    n_left = -chx * right + shx * look
    n_right = chx * right + shx * look
    n_up = -chy * up + shy * look
    n_down = chy * up + shy * look
    normals = jnp.stack([n_left, n_right, n_up, n_down], axis=-2)  # (..., 4, 3)

    if boxes.shape[-1] == 5:
        normals = _rodrigues(look[..., None, :], normals, boxes[..., 4:5])

    # Corner vertices = intersections of adjacent boundary planes, in the
    # reference's order: (left,up), (down,left), (up,right), (right,down).
    pair_a = jnp.array([0, 3, 2, 1])
    pair_b = jnp.array([2, 0, 1, 3])
    corners = normalize(
        jnp.cross(normals[..., pair_a, :], normals[..., pair_b, :])
    )  # (..., 4, 3)
    return normals, corners, (pair_a, pair_b)


def _convex_fan_area(pts: jax.Array, valid: jax.Array) -> jax.Array:
    """Area of the convex spherical polygon spanned by the valid points.

    ``pts``: (..., K, 3) unit vectors, ``valid``: (..., K) bool. Points must
    lie on (the boundary of) one geodesically convex region per batch
    element; duplicates and points interior to a boundary arc are fine
    (zero-area fan triangles). Returns 0 where fewer than 3 valid points.
    """
    k = pts.shape[-2]
    dtype = pts.dtype
    w = valid.astype(dtype)[..., None]
    cen = normalize(jnp.sum(pts * w, axis=-2))  # inside the region (convexity)

    # Tangent frame at the centroid; reference axis chosen away from cen.
    z_far = jnp.abs(cen[..., 2:3]) < 0.9
    axis = jnp.where(
        z_far,
        jnp.asarray([0.0, 0.0, 1.0], dtype),
        jnp.asarray([1.0, 0.0, 0.0], dtype),
    )
    e1 = normalize(jnp.cross(cen, axis))
    e2 = jnp.cross(cen, e1)

    ang = jnp.arctan2(
        jnp.sum(pts * e2[..., None, :], axis=-1),
        jnp.sum(pts * e1[..., None, :], axis=-1),
    )
    key = jnp.where(valid, ang, jnp.asarray(100.0, dtype))  # invalid last

    key_s, xs, ys, zs = jax.lax.sort(
        (key, pts[..., 0], pts[..., 1], pts[..., 2]),
        dimension=-1,
        num_keys=1,
    )
    pts_s = jnp.stack([xs, ys, zs], axis=-1)  # (..., K, 3) CCW about cen

    nv = jnp.sum(valid, axis=-1)  # (...,)
    lane = jnp.arange(k)
    # Coordinates of the last valid (sorted) point, via a masked reduction
    # (cheaper than a dynamic gather on TPU).
    one_hot_last = (lane == (nv - 1)[..., None]).astype(dtype)[..., None]
    p_last = jnp.sum(pts_s * one_hot_last, axis=-2)  # (..., 3)
    # Replace padding with p_last: interior pad triangles vanish and the
    # wrap-around pair (q[K-1], q[0]) becomes the closing (last, first) edge.
    is_pad = lane >= nv[..., None]
    q = jnp.where(is_pad[..., None], p_last[..., None, :], pts_s)
    qn = jnp.concatenate([q[..., 1:, :], q[..., :1, :]], axis=-2)

    # Signed l'Huilier: 2*atan2(cen . (q x qn), 1 + q.qn + cen.q + cen.qn).
    num = jnp.sum(cen[..., None, :] * jnp.cross(q, qn), axis=-1)
    den = (
        1.0
        + jnp.sum(q * qn, axis=-1)
        + jnp.sum(cen[..., None, :] * q, axis=-1)
        + jnp.sum(cen[..., None, :] * qn, axis=-1)
    )
    tri = 2.0 * jnp.arctan2(num, den)
    area = jnp.sum(tri, axis=-1)
    return jnp.where(nv >= 3, jnp.maximum(area, 0.0), 0.0)


def unbiased_iou(boxes1: jax.Array, boxes2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Exact spherical IoU, elementwise over matching leading shapes."""
    n1, v1, _ = _box_planes_and_corners(boxes1)
    n2, v2, _ = _box_planes_and_corners(boxes2)

    # 40 candidate vertices. Cross intersections: for plane pair (i of box1,
    # j of box2) both +-cross directions are candidates.
    i_idx = jnp.repeat(jnp.arange(4), 4)
    j_idx = jnp.tile(jnp.arange(4), 4)
    raw12 = jnp.cross(n1[..., i_idx, :], n2[..., j_idx, :])
    cross12 = normalize(raw12, eps=1e-10)
    cands = jnp.concatenate([v1, v2, cross12, -cross12], axis=-2)  # (..., 40, 3)

    # (Near-)parallel plane pairs — coincident boundaries, e.g. two boxes
    # sharing a side, or identical boxes — have |n1 x n2| ~ 0: the
    # eps-normalized "intersection" is a near-zero vector whose plane dots
    # all sit inside the tolerance band, so it would pass the inside test as
    # a phantom near-origin point. The true polygon vertices on a shared
    # boundary are already covered by the corner candidates; drop the
    # degenerate crosses.
    cross_ok = jnp.sum(raw12 * raw12, axis=-1) > 1e-12  # (..., 16)
    corner_ok = jnp.ones(v1.shape[:-2] + (8,), bool)
    cand_ok = jnp.concatenate([corner_ok, cross_ok, cross_ok], axis=-1)

    # Inside-all-8-planes test with tolerance. NOTE: explicit multiply-sum,
    # not einsum/matmul — tiny-contraction dots must stay in fp32 on the VPU
    # (an MXU matmul would run at bf16 default precision and the ~1e-3 error
    # breaks the on-plane tolerance test).
    planes = jnp.concatenate([n1, n2], axis=-2)  # (..., 8, 3)
    dots = jnp.sum(cands[..., :, None, :] * planes[..., None, :, :], axis=-1)
    inside = jnp.all(dots >= -_TOL, axis=-1) & cand_ok  # (..., 40)

    inter = _convex_fan_area(cands, inside)

    area1 = spherical_box_area(boxes1[..., 2], boxes1[..., 3])
    area2 = spherical_box_area(boxes2[..., 2], boxes2[..., 3])
    # The fan area is exact up to fp32 roundoff but independent of the
    # analytic box areas; bound it so containment/identical classes cannot
    # exceed IoU 1 by roundoff.
    inter = jnp.minimum(inter, jnp.minimum(area1, area2))
    return (inter + eps) / (area1 + area2 - inter - eps)
