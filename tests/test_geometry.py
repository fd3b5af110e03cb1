"""Geometry core: box primitives and Sph2Pob transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import (
    generate_boxes,
    is_valid_boxes,
    sph2pob_efficient,
    sph2pob_legacy,
    sph2pob_standard,
    standardize_spherical_box,
)
from sph_retina_tpu.geometry.boxes import (
    sph_to_unit_vec,
    spherical_box_area,
    unit_vec_to_sph,
)


def test_generate_boxes_valid():
    for version in (4, 5):
        boxes = generate_boxes(256, version, seed=3)
        assert boxes.shape == (256, version)
        assert bool(is_valid_boxes(jnp.asarray(boxes)))


def test_is_valid_boxes_flags():
    bad = jnp.array([[361.0, 90.0, 40.0, 40.0], [10.0, 90.0, 40.0, 40.0]])
    flags = is_valid_boxes(bad, need_flag=True)
    assert not bool(flags[0]) and bool(flags[1])
    assert not bool(is_valid_boxes(bad))


def test_unit_vec_round_trip():
    boxes = generate_boxes(128, 4, seed=0)
    theta = jnp.deg2rad(jnp.asarray(boxes[:, 0]))
    phi = jnp.deg2rad(jnp.asarray(boxes[:, 1]))
    v = sph_to_unit_vec(theta, phi)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-6
    )
    t2, p2 = unit_vec_to_sph(v)
    # theta returned signed; compare modulo 2 pi
    dt = np.mod(np.asarray(t2 - theta) + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dt, 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(phi), atol=1e-3)


def test_standardize_crosses_seam():
    b1 = jnp.array([[350.0, 90.0, 40.0, 30.0]])
    b2 = jnp.array([[10.0, 85.0, 40.0, 40.0]])
    s1, s2 = standardize_spherical_box(b1, b2)
    assert abs(float(s1[0, 0] - s2[0, 0])) <= 180.0


def test_spherical_area_limits():
    # Tiny box ~ planar area; hemisphere-ish box is large but < 4 pi.
    small = spherical_box_area(jnp.deg2rad(1.0), jnp.deg2rad(1.0))
    # fp32: the 4*arccos - 2pi form cancels catastrophically for tiny boxes,
    # leaving ~1% relative error at 1 deg — inherent to the formula.
    np.testing.assert_allclose(
        float(small), np.deg2rad(1.0) ** 2, rtol=5e-2
    )
    # A 180x180 "box" is a hemisphere: area exactly 2 pi.
    big = spherical_box_area(jnp.deg2rad(179.0), jnp.deg2rad(179.0))
    assert np.pi < float(big) < 2 * np.pi


@pytest.mark.parametrize("version", [4, 5])
def test_efficient_places_pair_canonically(version):
    b1 = jnp.deg2rad(jnp.asarray(generate_boxes(64, version, seed=1)))
    b2 = jnp.deg2rad(jnp.asarray(generate_boxes(64, version, seed=2)))
    pob1, pob2 = jax.jit(sph2pob_efficient)(b1, b2)
    assert pob1.shape == (64, 5) and pob2.shape == (64, 5)
    # box1 at the origin, box2 on the +x axis at the arc distance
    np.testing.assert_allclose(np.asarray(pob1[:, :2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pob2[:, 1]), 0.0, atol=1e-6)
    assert np.all(np.asarray(pob2[:, 0]) >= 0.0)
    # FoVs preserved in 'arc' mode
    np.testing.assert_allclose(
        np.asarray(pob1[:, 2:4]), np.asarray(b1[:, 2:4]), atol=1e-6
    )


def test_standard_equivalent_to_efficient_geometry():
    """Both transforms must yield the same relative pose, hence equal
    center distances and size columns."""
    b1 = jnp.deg2rad(jnp.asarray(generate_boxes(256, 4, seed=5)))
    b2 = jnp.deg2rad(jnp.asarray(generate_boxes(256, 4, seed=6)))
    e1, e2 = jax.jit(sph2pob_efficient)(b1, b2)
    s1, s2 = jax.jit(sph2pob_standard)(b1, b2)
    d_eff = np.asarray(jnp.abs(e2[:, 0] - e1[:, 0]))
    d_std = np.asarray(
        jnp.sqrt(jnp.sum((s2[:, :2] - s1[:, :2]) ** 2, axis=-1))
    )
    np.testing.assert_allclose(d_eff, d_std, atol=5e-3)
    np.testing.assert_allclose(np.asarray(e1[:, 2:4]), np.asarray(s1[:, 2:4]), atol=1e-6)
    # Relative angle between the two boxes agrees.
    rel_eff = np.asarray(e2[:, 4] - e1[:, 4])
    rel_std = np.asarray(s2[:, 4] - s1[:, 4])
    np.testing.assert_allclose(rel_eff, rel_std, atol=2e-2)


def test_legacy_runs_and_is_finite():
    b1 = jnp.asarray(generate_boxes(64, 4, seed=7))
    b2 = jnp.asarray(generate_boxes(64, 4, seed=8))
    s1, s2 = standardize_spherical_box(b1, b2)
    p1, p2 = jax.jit(sph2pob_legacy)(jnp.deg2rad(s1), jnp.deg2rad(s2))
    assert np.isfinite(np.asarray(p1)).all()
    assert np.isfinite(np.asarray(p2)).all()


def test_transforms_differentiable():
    b1 = jnp.deg2rad(jnp.asarray(generate_boxes(16, 4, seed=9)))
    b2 = jnp.deg2rad(jnp.asarray(generate_boxes(16, 4, seed=10)))

    for fn in (sph2pob_efficient, sph2pob_standard):
        def loss(x, y, fn=fn):
            p, q = fn(x, y)
            return jnp.sum(p) + jnp.sum(q)

        g1, g2 = jax.grad(loss, argnums=(0, 1))(b1, b2)
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()


def test_standard_degenerate_pair_no_nan():
    """Coincident centers must take the fallback rotation, without NaNs in
    either the value or the gradient."""
    b = jnp.deg2rad(jnp.array([[90.0, 90.0, 40.0, 30.0]]))

    def loss(x):
        p, q = sph2pob_standard(x, x)
        return jnp.sum(p * q)

    assert np.isfinite(float(loss(b)))
    assert np.isfinite(np.asarray(jax.grad(loss)(b))).all()
