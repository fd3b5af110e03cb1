"""Sph2Pob: spherical box pair -> planar oriented box (POB) pair.

The core geometric idea of the framework: a *pair* of spherical boxes is mapped
to a *pair* of planar rotated rectangles preserving their relative pose, so
rotated-rectangle IoU approximates spherical IoU (differentiably and fast).

Three variants with reference-parity semantics (behavior studied from
/root/reference/sphdet/iou/sph2pob_{standard,efficient,legacy}.py; rebuilt here
as branch-free batched jnp over (..., 4|5) boxes):

- ``sph2pob_efficient``: no explicit rotation. The axis through both centers'
  cross product plays the role of the rotated z-axis; output places box1 at the
  origin and box2 at (arc_distance, 0).
- ``sph2pob_standard``: explicit rotation moving both centers onto the equator
  symmetric about (1,0,0); internal angles measured against the rotated z-axis.
- ``sph2pob_legacy``: handcrafted-rule variant (equator repositioning with
  arc-length preservation; approximate angles).

All functions take boxes in **radians** with layout (theta, phi, alpha, beta
[, gamma]) over the last axis and return two (..., 5) rotated boxes
(cx, cy, w, h, angle_rad). Degree handling lives in the IoU API layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import (
    angle_between,
    longitude_tangent,
    normalize,
    rotation_sign,
    sph_to_unit_vec,
)


def _edge_length(fov: jax.Array, mode: str) -> jax.Array:
    """Planar edge length for an angular FoV (reference sph2pob_*.py:100-108)."""
    if mode == "arc":
        return fov
    if mode == "tangent":
        return 2.0 * jnp.tan(fov / 2.0)
    if mode == "chord":
        return 2.0 * jnp.sin(fov / 2.0)
    raise ValueError(f"unsupported rbb_edge mode: {mode}")


def _split(boxes: jax.Array):
    return boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]


def _signed_angle_to_axis(direction, axis, ref, project: bool):
    """Signed angle between ``direction`` and ``axis``, sign from ``ref``.

    Positive where axis->direction turns clockwise w.r.t. ref
    (reference sph2pob_efficient.py:81-97).
    """
    if project:
        direction = direction.at[..., 0].set(0.0)
    ang = angle_between(direction, axis)
    return ang * rotation_sign(axis, direction, ref)


# ---------------------------------------------------------------------------
# Efficient variant (default hot path)
# ---------------------------------------------------------------------------
def sph2pob_efficient(
    boxes1: jax.Array,
    boxes2: jax.Array,
    *,
    rbb_edge: str = "arc",
    rbb_angle: str = "equator",
):
    """Rotation-free Sph2Pob (reference sph2pob_efficient.py:9-73).

    Args:
        boxes1, boxes2: (..., 4|5) spherical boxes in radians.
    Returns:
        (pob1, pob2): two (..., 5) planar rotated boxes (cx, cy, w, h, ang).
    """
    assert rbb_angle in ("equator", "project")
    t1, p1, a1, b1 = _split(boxes1)
    t2, p2, a2, b2 = _split(boxes2)

    c1 = sph_to_unit_vec(t1, p1)
    c2 = sph_to_unit_vec(t2, p2)
    d1 = longitude_tangent(t1, p1)
    d2 = longitude_tangent(t2, p2)

    # Axis orthogonal to both centers = z-axis of the implicit rotated frame;
    # midpoint direction = in-plane reference for the turning sign.
    axis = jnp.cross(c1, c2)
    ref = (c1 + c2) * 0.5
    arc = angle_between(c1, c2)

    ang1 = _signed_angle_to_axis(d1, axis, ref, rbb_angle == "project")
    ang2 = _signed_angle_to_axis(d2, axis, ref, rbb_angle == "project")

    if boxes1.shape[-1] == 5 and boxes2.shape[-1] == 5:
        ang1 = ang1 - boxes1[..., 4]
        ang2 = ang2 - boxes2[..., 4]

    zeros = jnp.zeros_like(arc)
    pob1 = jnp.stack(
        [zeros, zeros, _edge_length(a1, rbb_edge), _edge_length(b1, rbb_edge), ang1],
        axis=-1,
    )
    pob2 = jnp.stack(
        [arc, zeros, _edge_length(a2, rbb_edge), _edge_length(b2, rbb_edge), ang2],
        axis=-1,
    )
    return pob1, pob2


# ---------------------------------------------------------------------------
# Standard variant (explicit rotation)
# ---------------------------------------------------------------------------
def _rotate_matrix_lookat(theta, phi):
    """Rows (look, down, right): moves the point at (theta, phi) to +x.

    Reference sph2pob_standard.py:239-261.
    """
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    zero = jnp.zeros_like(theta)
    look = jnp.stack([sp * ct, sp * st, cp], axis=-1)
    down = jnp.stack([cp * ct, cp * st, -sp], axis=-1)
    right = jnp.stack([st, -ct, zero], axis=-1)
    return jnp.stack([look, down, right], axis=-2)  # (..., 3, 3)


def _mat3_vec(m: jax.Array, v: jax.Array) -> jax.Array:
    """(..., 3, 3) @ (..., 3) with explicit fp32 multiply-sum (VPU, not MXU).

    Small-contraction matmuls/einsums hit the backend's low default matmul
    precision (bf16 on the TPU MXU); geometry needs full fp32.
    """
    return jnp.sum(m * v[..., None, :], axis=-1)


def _mat3_mat3(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., 3, 3) @ (..., 3, 3), explicit multiply-sum for precision."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _rotate_matrix_pair(c1, c2, degenerate_mask):
    """Rows (look, right, up): midpoint -> +x, centers -> equator.

    Reference sph2pob_standard.py:264-283; the degenerate (coincident-center)
    rows are replaced by the caller, so feed them a safe dummy difference to
    keep gradients NaN-free under ``jnp.where``.
    """
    look = normalize(c1 + c2)
    diff = jnp.where(degenerate_mask[..., None], jnp.array([0.0, 1.0, 0.0]), c2 - c1)
    right = normalize(diff)
    up = jnp.cross(look, right)
    return jnp.stack([look, right, up], axis=-2)


def _spherical_coordinate_signed(v):
    """(theta, phi) of rotated points; theta signed in (-pi, pi).

    Reference sph2pob_standard.py:175-199 (angles measured against +z / +x with
    a clockwise sign w.r.t. -z).
    """
    z = jnp.array([0.0, 0.0, 1.0])
    x = jnp.array([1.0, 0.0, 0.0])
    phi = angle_between(v, z)
    v_xy = v.at[..., 2].set(0.0)
    theta = angle_between(v_xy, x) * rotation_sign(x, v_xy, -jnp.broadcast_to(z, v.shape))
    return theta, phi


def _rotate_about_axis_at(theta, phi, gamma):
    """Rotation by gamma about the radial axis at (theta, phi).

    R' = T^T Rx(gamma) T with T the look-at frame
    (reference sph2pob_standard.py:300-314).
    """
    T = _rotate_matrix_lookat(theta, phi)
    sg, cg = jnp.sin(gamma), jnp.cos(gamma)
    zero, one = jnp.zeros_like(gamma), jnp.ones_like(gamma)
    rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, cg, -sg], axis=-1),
            jnp.stack([zero, sg, cg], axis=-1),
        ],
        axis=-2,
    )
    t_T = jnp.swapaxes(T, -1, -2)
    return _mat3_mat3(_mat3_mat3(t_T, rx), T)


def sph2pob_standard(
    boxes1: jax.Array,
    boxes2: jax.Array,
    *,
    rbb_edge: str = "arc",
    rbb_angle: str = "equator",
    eps: float = 1e-8,
):
    """Standard Sph2Pob with an explicit rotation (sph2pob_standard.py:8-80)."""
    assert rbb_angle in ("equator", "project")
    t1, p1, a1, b1 = _split(boxes1)
    t2, p2, a2, b2 = _split(boxes2)

    c1 = sph_to_unit_vec(t1, p1)
    c2 = sph_to_unit_vec(t2, p2)
    d1 = longitude_tangent(t1, p1)
    d2 = longitude_tangent(t2, p2)

    if boxes1.shape[-1] == 5:
        d1 = _mat3_vec(_rotate_about_axis_at(t1, p1, -boxes1[..., 4]), d1)
    if boxes2.shape[-1] == 5:
        d2 = _mat3_vec(_rotate_about_axis_at(t2, p2, -boxes2[..., 4]), d2)

    # Rotation: pair frame when the centers differ; look-at midpoint otherwise.
    degenerate = jnp.sum(jnp.abs(c1 - c2), axis=-1) <= eps
    r_pair = _rotate_matrix_pair(c1, c2, degenerate)
    r_mid = _rotate_matrix_lookat((t1 + t2) / 2.0, (p1 + p2) / 2.0)
    R = jnp.where(degenerate[..., None, None], r_mid, r_pair)

    rc1 = _mat3_vec(R, c1)
    rc2 = _mat3_vec(R, c2)
    rd1 = _mat3_vec(R, d1)
    rd2 = _mat3_vec(R, d2)

    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), rd1.shape)
    x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), rd1.shape)
    ang1 = _signed_angle_to_axis(rd1, z, x, rbb_angle == "project")
    ang2 = _signed_angle_to_axis(rd2, z, x, rbb_angle == "project")

    th1, ph1 = _spherical_coordinate_signed(rc1)
    th2, ph2 = _spherical_coordinate_signed(rc2)

    pob1 = jnp.stack(
        [th1, ph1, _edge_length(a1, rbb_edge), _edge_length(b1, rbb_edge), ang1],
        axis=-1,
    )
    pob2 = jnp.stack(
        [th2, ph2, _edge_length(a2, rbb_edge), _edge_length(b2, rbb_edge), ang2],
        axis=-1,
    )
    return pob1, pob2


# ---------------------------------------------------------------------------
# Legacy variant (handcrafted rules)
# ---------------------------------------------------------------------------
def sph2pob_legacy(
    boxes1: jax.Array,
    boxes2: jax.Array,
    *,
    rbb_edge: str = "arc",
    rbb_angle: str | None = None,
):
    """Handcraft-rule Sph2Pob (reference sph2pob_legacy.py:8-31).

    Repositions both boxes to the equator preserving the great-circle distance
    between centers; the internal angle is an approximation. Works on BFoV
    (first four components) only, matching the reference.
    """
    del rbb_angle  # unused by the legacy rules
    t1, p1, a1, b1 = _split(boxes1)
    t2, p2, a2, b2 = _split(boxes2)

    # "Convention" frame: longitude in (-pi, pi), latitude in (pi/2, -pi/2)
    # (reference angle2radian mode='convention', legacy:217-234).
    lam1, lam2 = t1 - jnp.pi, t2 - jnp.pi
    lat1, lat2 = jnp.pi / 2.0 - p1, jnp.pi / 2.0 - p2

    # Latitudes relative to their midpoint.
    lat_mid = (lat1 + lat2) / 2.0
    lat1_, lat2_ = lat1 - lat_mid, lat2 - lat_mid

    # Haversine arc length between the two centers.
    dlat = jnp.abs(lat1 - lat2)
    dlam = jnp.abs(lam1 - lam2)
    hav = jnp.sin(dlat / 2.0) ** 2 + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlam / 2.0) ** 2
    L = 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(hav, 0.0, 1.0)))

    # Longitude separation on the (near-)equator giving the same arc length.
    num = jnp.sin(L / 2.0) ** 2 - jnp.sin(dlat / 2.0) ** 2
    den = jnp.cos(lat1_) * jnp.cos(lat2_)
    ratio = jnp.clip(num / jnp.maximum(den, 1e-12), 0.0, 1.0)
    dlam_ = jnp.abs(2.0 * jnp.arcsin(jnp.sqrt(ratio)))
    lam2_sign = jnp.where(lam2 > lam1, 1.0, -1.0)

    # Approximate internal angles from longitude tangents at box vs reference
    # point (same latitude, midpoint longitude) — legacy:102-134.
    t_mid = (t1 + t2) / 2.0

    def _legacy_angle(theta_box, phi_box, theta_ref):
        db = longitude_tangent(theta_box, phi_box)
        dr = longitude_tangent(theta_ref, phi_box)
        ang = angle_between(db, dr)
        north = phi_box < jnp.pi / 2.0
        pos = (theta_box >= theta_ref) & north | (theta_box <= theta_ref) & ~north
        return jnp.where(pos, ang, -ang)

    ang1 = _legacy_angle(t1, p1, t_mid)
    ang2 = _legacy_angle(t2, p2, t_mid)

    zeros = jnp.zeros_like(t1)
    pob1 = jnp.stack(
        [zeros, lat1_, _edge_length(a1, rbb_edge), _edge_length(b1, rbb_edge), ang1],
        axis=-1,
    )
    pob2 = jnp.stack(
        [dlam_ * lam2_sign, lat2_, _edge_length(a2, rbb_edge), _edge_length(b2, rbb_edge), ang2],
        axis=-1,
    )
    return pob1, pob2
