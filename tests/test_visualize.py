"""ERP visualization: geometry of drawn boundaries, seam handling, IO."""

import numpy as np

from sph_retina_tpu.visualize import draw_boxes, erp_box_polyline, plot_iou_scatter


def test_polyline_centered_box():
    segs = erp_box_polyline([180.0, 90.0, 40.0, 30.0], img_size=(512, 1024))
    assert len(segs) == 1  # no seam crossing
    pts = segs[0]
    # boundary pixels must surround the box center (512, 256)
    assert pts[:, 0].min() < 512 < pts[:, 0].max()
    assert pts[:, 1].min() < 256 < pts[:, 1].max()
    # extents roughly match the FoV (40 deg of 360 -> ~113 px wide)
    w = pts[:, 0].max() - pts[:, 0].min()
    assert 90 < w < 140


def test_polyline_seam_split():
    segs = erp_box_polyline([358.0, 90.0, 30.0, 30.0], img_size=(512, 1024))
    assert len(segs) >= 2  # crosses theta=0


def test_polyline_rbfov_rotation_changes_outline():
    a = np.concatenate(erp_box_polyline([90.0, 60.0, 40.0, 20.0, 0.0]))
    b = np.concatenate(erp_box_polyline([90.0, 60.0, 40.0, 20.0, 45.0]))
    assert abs(a[:, 1].max() - b[:, 1].max()) > 5  # rotated outline differs


def test_draw_boxes_writes_pixels():
    img = np.zeros((128, 256, 3), np.uint8)
    out = draw_boxes(img, [[180.0, 90.0, 60.0, 40.0]], labels=[1],
                     scores=[0.9], class_names=["a", "b"])
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn


def test_plot_scatter(tmp_path):
    a = np.random.default_rng(0).random(100)
    r = plot_iou_scatter(a, a * 0.9 + 0.05, out_file=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()
    assert r > 0.99
