"""Anchor-shape optimization (reference optimize_anchors.py parity).

The optimizers must strictly improve the dataset's average best-anchor IoU
over a poor initial anchor set, and recover obvious FoV clusters.
"""

import numpy as np
import pytest

from sph_retina_tpu.boxes.anchor_opt import (
    centered_boxes,
    evolve_anchors,
    kmeans_anchors,
    mean_best_iou,
)


@pytest.fixture(scope="module")
def clustered_fovs():
    """Two tight FoV clusters: (20, 10)-ish and (60, 40)-ish."""
    rng = np.random.default_rng(0)
    a = rng.normal([20, 10], 1.0, (60, 2))
    b = rng.normal([60, 40], 1.5, (60, 2))
    return np.clip(np.concatenate([a, b]), 2, 175).astype(np.float32)


def test_centered_boxes_shape():
    out = np.asarray(centered_boxes(np.array([[30.0, 20.0]])))
    np.testing.assert_allclose(out, [[180.0, 90.0, 30.0, 20.0]])


def test_kmeans_recovers_clusters(clustered_fovs):
    anchors = kmeans_anchors(clustered_fovs, 2, iters=20, seed=0)
    assert anchors.shape == (2, 2)
    # sorted by area: first ~ (20,10), second ~ (60,40)
    np.testing.assert_allclose(anchors[0], [20, 10], atol=2.5)
    np.testing.assert_allclose(anchors[1], [60, 40], atol=2.5)
    good = mean_best_iou(clustered_fovs, anchors)
    bad = mean_best_iou(clustered_fovs, np.array([[120.0, 120.0]]))
    assert good > 0.85 > bad


def test_evolve_improves_over_config_anchors(clustered_fovs):
    base = np.array([[90.0, 90.0], [45.0, 45.0]], np.float32)
    before = mean_best_iou(clustered_fovs, base)
    anchors = evolve_anchors(clustered_fovs, 2, iters=60, pop_size=24, seed=0)
    after = mean_best_iou(clustered_fovs, anchors)
    assert after > before
    assert after > 0.8
    assert (anchors >= 1.0).all() and (anchors <= 179.0).all()


def test_kmeans_rejects_too_few_gt():
    with pytest.raises(ValueError):
        kmeans_anchors(np.ones((3, 2), np.float32), 5)
