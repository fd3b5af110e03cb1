"""Pallas fused-IoU kernels vs the stacked jnp path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.iou import sph_overlaps
from sph_retina_tpu.ops import (
    sph2pob_iou_aligned_tpu,
    sph2pob_iou_pairwise_tpu,
)
from sph_retina_tpu.ops.fused_iou import arccos_poly


def test_arccos_poly_accuracy():
    x = jnp.linspace(-0.9999, 0.9999, 4001)
    got = np.asarray(arccos_poly(x))
    np.testing.assert_allclose(got, np.arccos(np.asarray(x)), atol=2e-5)


@pytest.mark.parametrize("version", [4, 5])
def test_aligned_matches_jnp_path(version):
    b1 = jnp.asarray(generate_boxes(40, version, seed=1))
    b2 = jnp.asarray(generate_boxes(40, version, seed=2))
    ref = np.asarray(sph_overlaps(b1, b2, "sph2pob_efficient", is_aligned=True))
    got = np.asarray(sph2pob_iou_aligned_tpu(b1, b2, block_rows=1))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pairwise_matches_jnp_path():
    b1 = jnp.asarray(generate_boxes(20, 4, seed=1))
    b2 = jnp.asarray(generate_boxes(12, 4, seed=2))
    ref = np.asarray(sph_overlaps(b1, b2, "sph2pob_efficient"))
    got = np.asarray(sph2pob_iou_pairwise_tpu(b1, b2, tile_n=8, tile_m=128))
    assert got.shape == (20, 12)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_aligned_identical_boxes():
    b = jnp.asarray(generate_boxes(16, 4, seed=3))
    iou = np.asarray(sph2pob_iou_aligned_tpu(b, b, block_rows=1))
    assert (iou > 0.9).all()


def test_padding_is_masked_out():
    # deliberately non-multiple sizes
    b1 = jnp.asarray(generate_boxes(7, 4, seed=5))
    b2 = jnp.asarray(generate_boxes(5, 4, seed=6))
    out = sph2pob_iou_pairwise_tpu(b1, b2, tile_n=8, tile_m=128)
    assert out.shape == (7, 5)
    assert np.isfinite(np.asarray(out)).all()
