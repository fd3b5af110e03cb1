"""Fused Sph2Pob-IoU pipeline in componentwise, inverse-trig-free form.

The whole hot path — degree-space jitter, efficient Sph2Pob transform,
rotated-box jitter, Green's-theorem rectangle intersection — expressed over
*separate component arrays* instead of stacked (..., D) boxes, using only primitives
the Mosaic TPU compiler lowers (sin/cos/sqrt/rsqrt/div; **no**
arccos/atan2, which Pallas-TPU does not implement):

- the internal rotation angle is never materialized: the clipping only needs
  ``cos(ang)`` and ``sin(ang)``, which fall out of the dot/cross products
  directly (gamma for RBFoV folds in via angle-subtraction identities);
- the single genuine inverse-trig use — the arc distance between box
  centers — goes through a Cephes-style polynomial atan
  (``arccos(x) = 2 atan(sqrt((1-x)/(1+x)))``, ~1e-7 absolute error).

Two consumers:

- the Pallas pairwise/aligned kernels (``pallas_iou.py``), where component
  arrays map 1:1 onto VPU-shaped (sublane, lane) registers;
- the XLA fused path (same function jits on any backend).

Shape-polymorphic: feed (S, 128) tiles from a kernel, (N,) vectors, or
broadcast (N, 1) x (1, M) for the pairwise case.

Semantics match ``sph_overlaps(..., backend="sph2pob_efficient")`` (reference
behavior from /root/reference/sphdet/iou/sph_iou_api.py:48-98) up to the
angle-jitter reformulation in (cos, sin) space.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..iou.rotated import intersection_greens_cs as _intersection_greens_cs

_EPS = 1e-4 * 1.2345678
_ANG_EPS = 1e-3 * 1.2345678
_COS_EPS = 1e-7
_PI = math.pi


def _atan_cephes(x):
    """atan for x >= 0, Cephes atanf range reduction + degree-9 polynomial."""
    big = x > 2.414213562373095
    mid = x > 0.4142135623730950
    x_big = -1.0 / jnp.where(big, x, 1.0)
    x_mid = (x - 1.0) / (x + 1.0)
    z_in = jnp.where(big, x_big, jnp.where(mid, x_mid, x))
    y0 = jnp.where(big, _PI / 2.0, jnp.where(mid, _PI / 4.0, 0.0))
    z = z_in * z_in
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
         - 3.33329491539e-1) * z * z_in + z_in
    return y0 + p


def arccos_poly(x):
    """arccos on [-1, 1] without an acos primitive; ~1e-7 abs error."""
    x = jnp.clip(x, -1.0 + _COS_EPS, 1.0 - _COS_EPS)
    t = jnp.sqrt((1.0 - x) / (1.0 + x))
    return 2.0 * _atan_cephes(t)


def _jitter_spherical(b1, b2):
    """Componentwise port of jitter_spherical_boxes (degrees)."""
    eps = _EPS
    similar = None
    for x, y in zip(b1, b2):
        c = jnp.abs(x - y) < eps
        similar = c if similar is None else (similar | c)
    b1 = [jnp.where(similar, x - 2 * eps, x) for x in b1]
    b2 = [jnp.where(similar, x + eps, x) for x in b2]

    def clamp(vals, lo, hi):
        out = [jnp.clip(vals[0], lo, 360.0 - hi)]
        out += [jnp.clip(v, lo, 180.0 - hi) for v in vals[1:4]]
        if len(vals) == 5:
            out.append(jnp.clip(vals[4], -360.0 + lo, 360.0 - hi))
        return out

    b1 = clamp(b1, 2 * eps, eps)
    b2 = clamp(b2, eps, 2 * eps)
    return b1, b2


def _rot_shift(c, s, delta):
    """(cos a, sin a) -> (cos(a+delta), sin(a+delta)) for constant delta."""
    cd, sd = math.cos(delta), math.sin(delta)
    return c * cd - s * sd, s * cd + c * sd


def _jitter_rotated_cs(p1, p2):
    """Rotated-box jitter with angles held as (cos, sin).

    Angle similarity is detected via |sin(a1 - a2)| (fp32-friendly; also
    treats pi-offset angles — identical rectangles — as similar), shifts are
    exact rotations. Semantics of jitter_rotated_boxes otherwise.
    """
    eps = _EPS
    cx1, cy1, w1, h1, c1, s1 = p1
    cx2, cy2, w2, h2, c2, s2 = p2

    sin_diff = jnp.abs(s1 * c2 - c1 * s2)
    similar = (
        (jnp.abs(cx1 - cx2) < eps)
        | (jnp.abs(w1 - w2) < eps)
        | (jnp.abs(h1 - h2) < eps)
        | (sin_diff < eps)
    )
    cx1 = jnp.where(similar, cx1 + eps, cx1)
    cy1 = jnp.where(similar, cy1 + eps, cy1)
    w1 = jnp.where(similar, w1 + 2 * eps, w1)
    h1 = jnp.where(similar, h1 + 2 * eps, h1)
    c1s, s1s = _rot_shift(c1, s1, eps)
    c1 = jnp.where(similar, c1s, c1)
    s1 = jnp.where(similar, s1s, s1)
    cx2 = jnp.where(similar, cx2 + 2 * eps, cx2)
    cy2 = jnp.where(similar, cy2 + 2 * eps, cy2)
    w2 = jnp.where(similar, w2 + eps, w2)
    h2 = jnp.where(similar, h2 + eps, h2)
    c2s, s2s = _rot_shift(c2, s2, 5 * eps)
    c2 = jnp.where(similar, c2s, c2)
    s2 = jnp.where(similar, s2s, s2)

    ang_close = jnp.abs(s1 * c2 - c1 * s2) < _ANG_EPS
    c1s, s1s = _rot_shift(c1, s1, _ANG_EPS)
    c1 = jnp.where(ang_close, c1s, c1)
    s1 = jnp.where(ang_close, s1s, s1)
    c2s, s2s = _rot_shift(c2, s2, 2 * _ANG_EPS)
    c2 = jnp.where(ang_close, c2s, c2)
    s2 = jnp.where(ang_close, s2s, s2)

    w1 = jnp.maximum(w1, 2 * eps / 10.0)
    h1 = jnp.maximum(h1, 2 * eps / 10.0)
    w2 = jnp.maximum(w2, eps / 10.0)
    h2 = jnp.maximum(h2, eps / 10.0)
    return (cx1, cy1, w1, h1, c1, s1), (cx2, cy2, w2, h2, c2, s2)


def _transform_efficient_cs(b1, b2):
    """Componentwise sph2pob_efficient with (cos, sin) angle output.

    Inputs in radians; returns two 6-tuples (cx, cy, w, h, cos_ang, sin_ang).
    """
    t1, p1, a1, be1 = b1[0], b1[1], b1[2], b1[3]
    t2, p2, a2, be2 = b2[0], b2[1], b2[2], b2[3]

    sp1, cp1 = jnp.sin(p1), jnp.cos(p1)
    st1, ct1 = jnp.sin(t1), jnp.cos(t1)
    sp2, cp2 = jnp.sin(p2), jnp.cos(p2)
    st2, ct2 = jnp.sin(t2), jnp.cos(t2)

    # Unit center vectors and longitude tangents.
    c1x, c1y, c1z = sp1 * ct1, sp1 * st1, cp1
    c2x, c2y, c2z = sp2 * ct2, sp2 * st2, cp2
    d1x, d1y, d1z = cp1 * ct1, cp1 * st1, -sp1
    d2x, d2y, d2z = cp2 * ct2, cp2 * st2, -sp2

    # Frame axis (c1 x c2) and in-plane sign reference (c1 + c2).
    ax = c1y * c2z - c1z * c2y
    ay = c1z * c2x - c1x * c2z
    az = c1x * c2y - c1y * c2x
    rx, ry, rz = c1x + c2x, c1y + c2y, c1z + c2z

    arc = arccos_poly(c1x * c2x + c1y * c2y + c1z * c2z)
    inv_an = jax.lax.rsqrt(jnp.maximum(ax * ax + ay * ay + az * az, 1e-24))

    def angle_cs(dx, dy, dz):
        """cos/sin of the signed angle from the frame axis to tangent d."""
        cos_v = jnp.clip(
            (dx * ax + dy * ay + dz * az) * inv_an, -1 + _COS_EPS, 1 - _COS_EPS
        )
        # sign: cross(axis, d) . ref < 0 -> clockwise -> positive angle
        cxd_x = ay * dz - az * dy
        cxd_y = az * dx - ax * dz
        cxd_z = ax * dy - ay * dx
        sign = jnp.where(cxd_x * rx + cxd_y * ry + cxd_z * rz < 0, 1.0, -1.0)
        sin_v = sign * jnp.sqrt(jnp.maximum(1.0 - cos_v * cos_v, 0.0))
        return cos_v, sin_v

    cos1, sin1 = angle_cs(d1x, d1y, d1z)
    cos2, sin2 = angle_cs(d2x, d2y, d2z)
    if len(b1) == 5 and len(b2) == 5:
        # ang -= gamma  (angle-subtraction identities)
        cg1, sg1 = jnp.cos(b1[4]), jnp.sin(b1[4])
        cos1, sin1 = cos1 * cg1 + sin1 * sg1, sin1 * cg1 - cos1 * sg1
        cg2, sg2 = jnp.cos(b2[4]), jnp.sin(b2[4])
        cos2, sin2 = cos2 * cg2 + sin2 * sg2, sin2 * cg2 - cos2 * sg2

    zero = jnp.zeros_like(arc)
    return (zero, zero, a1, be1, cos1, sin1), (arc, zero, a2, be2, cos2, sin2)



def fused_sph2pob_iou(b1, b2):
    """Degrees-in componentwise fused IoU.

    Args:
        b1, b2: lists/tuples of 4 or 5 broadcast-compatible component arrays
            (theta, phi, alpha, beta[, gamma]) in degrees.
    Returns:
        IoU array of the broadcast shape, clipped to [0, 1].
    """
    b1 = [jnp.asarray(v, jnp.float32) for v in b1]
    b2 = [jnp.asarray(v, jnp.float32) for v in b2]
    b1, b2 = _jitter_spherical(b1, b2)
    deg2rad = _PI / 180.0
    b1 = [v * deg2rad for v in b1]
    b2 = [v * deg2rad for v in b2]
    p1, p2 = _transform_efficient_cs(b1, b2)
    p1, p2 = _jitter_rotated_cs(p1, p2)

    area1 = jnp.abs(p1[2] * p1[3])
    area2 = jnp.abs(p2[2] * p2[3])
    # Bound by each box area: the Green's form double-counts boundary runs
    # shared bitwise-exactly, which the jitter above makes improbable but
    # cannot rule out; the clamp keeps any residual case in [0, 1].
    inter = jnp.minimum(jnp.minimum(_intersection_greens_cs(p1, p2), area1),
                        area2)
    union = area1 + area2 - inter
    return jnp.clip(inter / union, 0.0, 1.0)
