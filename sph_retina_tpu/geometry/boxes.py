"""Spherical box primitives.

Pure ``jnp`` functions over arrays whose last axis holds box parameters.
All functions are shape-polymorphic over leading axes and safe under ``vmap``
/ ``jit`` (no data-dependent shapes or Python branching on traced values).

Conventions (reference parity: /root/reference/sphdet/bbox/box_formator.py:119-127
and /root/reference/tests/utils/generate_data.py:10-43):

- BFoV box   = (theta, phi, alpha, beta)          [degrees at the public API]
- RBFoV box  = (theta, phi, alpha, beta, gamma)
- theta ∈ [0, 360): longitude of center, phi ∈ [0, 180): colatitude of center,
  alpha/beta ∈ (0, 180): angular extents, gamma: rotation about the view axis.

The unit-sphere embedding used throughout the geometry core:
    x = sin(phi) cos(theta),  y = sin(phi) sin(theta),  z = cos(phi)
(so phi is measured from the +z pole; the equator is phi = 90 deg).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-7


def sph_to_unit_vec(theta: jax.Array, phi: jax.Array) -> jax.Array:
    """Embed spherical angles (radians) as unit vectors, shape (..., 3)."""
    sin_phi = jnp.sin(phi)
    return jnp.stack(
        [sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), jnp.cos(phi)], axis=-1
    )


def longitude_tangent(theta: jax.Array, phi: jax.Array) -> jax.Array:
    """Unit tangent along the longitude great circle (d/dphi of the embedding).

    Points "down" (towards growing colatitude); shape (..., 3).
    """
    cos_phi = jnp.cos(phi)
    return jnp.stack(
        [cos_phi * jnp.cos(theta), cos_phi * jnp.sin(theta), -jnp.sin(phi)], axis=-1
    )


def unit_vec_to_sph(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of :func:`sph_to_unit_vec`; returns (theta, phi) in radians.

    theta is signed in (-pi, pi]; phi in [0, pi].
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1))
    phi = jnp.arccos(jnp.clip(z / jnp.maximum(norm, EPS), -1.0 + EPS, 1.0 - EPS))
    theta = jnp.arctan2(y, x)
    return theta, phi


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Safe L2 normalization along the last axis."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps)


def angle_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unsigned angle (radians) between direction vectors, last axis = 3.

    Matches the reference clamping of the cosine to +-(1 - 1e-7)
    (sph2pob_efficient.py:192-208) so identical directions give a small
    positive angle rather than an exact zero with an unstable gradient.
    """
    cos_val = jnp.sum(normalize(a) * normalize(b), axis=-1)
    return jnp.arccos(jnp.clip(cos_val, -1.0 + EPS, 1.0 - EPS))


def rotation_sign(a: jax.Array, b: jax.Array, ref: jax.Array) -> jax.Array:
    """+1 where a->b turns clockwise w.r.t. ``ref``, else -1.

    Clockwise means cross(a, b) points against ``ref``
    (reference: sph2pob_efficient.py:211-226).
    """
    crit = jnp.sum(jnp.cross(a, b) * ref, axis=-1) < 0
    return jnp.where(crit, 1.0, -1.0)


def standardize_spherical_box(boxes1: jax.Array, boxes2: jax.Array):
    """Shift theta by 180 deg (mod 360) for pairs straddling the seam.

    Removes the theta wrap-around discontinuity for planar approximations
    (reference: approximate_ious.py:60-81). Inputs/outputs in degrees.
    """
    move = jnp.abs(boxes1[..., 0] - boxes2[..., 0]) > 180.0
    t1 = jnp.where(move, (boxes1[..., 0] + 180.0) % 360.0, boxes1[..., 0])
    t2 = jnp.where(move, (boxes2[..., 0] + 180.0) % 360.0, boxes2[..., 0])
    boxes1 = boxes1.at[..., 0].set(t1)
    boxes2 = boxes2.at[..., 0].set(t2)
    return boxes1, boxes2


def spherical_box_area(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Exact area of a spherical rectangle with FoVs (alpha, beta) in radians.

    A = 4 arccos(-sin(a/2) sin(b/2)) - 2 pi   (reference: unbiased_iou_bfov.py:10-12).
    """
    s = -jnp.sin(alpha / 2.0) * jnp.sin(beta / 2.0)
    return 4.0 * jnp.arccos(jnp.clip(s, -1.0 + EPS, 1.0 - EPS)) - 2.0 * jnp.pi


def is_valid_boxes(boxes: jax.Array, need_flag: bool = False):
    """Validity predicate for degree-space boxes.

    Bounds are inclusive, matching the reference check
    (box_formator.py:119-127: theta <= 360, phi <= 180, alpha <= 360,
    beta <= 180) — decode clamps land exactly on the bounds in fp32.
    """
    theta, phi = boxes[..., 0], boxes[..., 1]
    alpha, beta = boxes[..., 2], boxes[..., 3]
    flag = (
        (theta >= 0.0) & (theta <= 360.0)
        & (phi >= 0.0) & (phi <= 180.0)
        & (alpha >= 0.0) & (alpha <= 360.0)
        & (beta >= 0.0) & (beta <= 180.0)
    )
    if boxes.shape[-1] == 5:
        gamma = boxes[..., 4]
        flag = flag & (gamma >= -180.0) & (gamma <= 180.0)
    if need_flag:
        return flag
    return jnp.all(flag)


def generate_boxes(
    n: int,
    box_version: int = 4,
    *,
    theta_range=(0.0, 360.0),
    phi_range=(0.0, 180.0),
    fov_range=(1.0, 100.0),
    gamma_range=(-90.0, 90.0),
    seed: int = 0,
    dtype=np.float32,
) -> np.ndarray:
    """Uniform random spherical boxes in degrees (host-side, numpy).

    Mirrors the distribution of the reference benchmark harness
    (tests/utils/generate_data.py:10-43, tests/test_all_ious.py:141-147).
    """
    rng = np.random.default_rng(seed)
    theta = rng.uniform(*theta_range, size=(n, 1))
    phi = rng.uniform(*phi_range, size=(n, 1))
    alpha = rng.uniform(*fov_range, size=(n, 1))
    beta = rng.uniform(*fov_range, size=(n, 1))
    cols = [theta, phi, alpha, beta]
    if box_version == 5:
        cols.append(rng.uniform(*gamma_range, size=(n, 1)))
    return np.concatenate(cols, axis=1).astype(dtype)
