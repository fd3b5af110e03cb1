"""ERP visualization: geometry of drawn boundaries, seam handling, IO."""

import os

import numpy as np

from sph_retina_tpu.visualize import draw_boxes, erp_box_polyline, plot_iou_scatter

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


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


# ---------------------------------------------------------------- camera
def test_camera_extract_recovers_centered_feature():
    """A perspective view centered on a bright ERP spot sees it centered."""
    from sph_retina_tpu.visualize import PerspectiveCamera

    erp = np.zeros((256, 512), np.float64)
    # bright spot at theta=100 deg, phi=70 deg
    erp[int(70 / 180 * 256), int(100 / 360 * 512)] = 1.0
    # blur it a touch so bilinear sampling can catch it
    erp = np.maximum.reduce([np.roll(np.roll(erp, i, 0), j, 1)
                             for i in (-1, 0, 1) for j in (-1, 0, 1)])
    cam = PerspectiveCamera(512, 256, fov_w=40, fov_h=40, long_side=96)
    view = cam.extract(erp, 100.0, 70.0)
    iy, ix = np.unravel_index(np.argmax(view), view.shape)
    assert abs(ix - view.shape[1] / 2) <= 2
    assert abs(iy - view.shape[0] / 2) <= 2


def test_camera_extract_shapes_and_dtype():
    from sph_retina_tpu.visualize import PerspectiveCamera

    erp = np.random.default_rng(0).integers(0, 255, (128, 256, 3)).astype(np.uint8)
    cam = PerspectiveCamera(256, 128, fov_w=64, fov_h=32, long_side=80)
    view = cam.extract(erp, 350.0, 90.0)  # crosses the seam
    assert view.dtype == np.uint8
    assert view.shape[1] == 80 and view.shape[0] < 80  # tangent aspect rule
    assert view.std() > 0


def test_camera_border_surrounds_center():
    from sph_retina_tpu.visualize import PerspectiveCamera

    cam = PerspectiveCamera(1024, 512)
    px = cam.box_border_px([180.0, 90.0, 40.0, 30.0])
    assert px[:, 0].min() < 512 < px[:, 0].max()
    assert px[:, 1].min() < 256 < px[:, 1].max()
    # tangent-plane border width ~ alpha: 40/360*1024 = 114 px
    wpx = px[:, 0].max() - px[:, 0].min()
    assert 90 < wpx < 140


def test_camera_rbfov_gamma_rotates_border():
    from sph_retina_tpu.visualize import PerspectiveCamera

    cam = PerspectiveCamera(1024, 512)
    a = cam.box_border_px([90.0, 60.0, 40.0, 16.0, 0.0])
    b = cam.box_border_px([90.0, 60.0, 40.0, 16.0, 45.0])
    assert abs(a[:, 1].max() - b[:, 1].max()) > 5


def test_camera_planar_bbox_seam():
    from sph_retina_tpu.visualize import PerspectiveCamera

    cam = PerspectiveCamera(1024, 512)
    inner = cam.planar_bbox([180.0, 90.0, 40.0, 30.0])
    assert inner[0] < 512 < inner[2]
    # box wrapping the seam reports the wider one-side cluster
    seam = cam.planar_bbox([1.0, 90.0, 40.0, 30.0])
    assert seam[2] - seam[0] < 1024 / 2


def test_camera_draw_box_writes_pixels():
    from sph_retina_tpu.visualize import PerspectiveCamera

    cam = PerspectiveCamera(256, 128)
    img = np.zeros((128, 256, 3), np.uint8)
    out = cam.draw_box(img, [358.0, 90.0, 30.0, 30.0], color=(0, 255, 0))
    assert out.sum() > 0


def test_kent_density_erp_integrates_and_peaks_at_center():
    """Exact Kent density on the ERP grid: quadrature-normalized to 1, peak
    at the source box center (vis_kent_samples.py counterpart)."""
    from sph_retina_tpu.iou import deg2kent
    from sph_retina_tpu.visualize import kent_density_erp

    params = np.asarray(deg2kent(np.array([[120.0, 60.0, 40.0, 30.0]])))[0]
    f = kent_density_erp(params, (128, 256))
    h, w = f.shape
    phi = (np.arange(h) + 0.5) * np.pi / h
    integral = np.sum(f * np.sin(phi)[:, None] * (2 * np.pi / w) * (np.pi / h))
    assert abs(integral - 1.0) < 1e-3
    iy, ix = np.unravel_index(np.argmax(f), f.shape)
    assert abs((ix + 0.5) * 360 / w - 120.0) < 3.0
    assert abs((iy + 0.5) * 180 / h - 60.0) < 3.0


def test_kent_sampler_matches_frame_and_anisotropy():
    """Tangent-Gaussian samples: mean direction = gamma1, spread wider along
    gamma2 (the beta-major axis) than gamma3."""
    from sph_retina_tpu.iou import deg2kent
    from sph_retina_tpu.iou.kent import kent_angles_to_gammas
    from sph_retina_tpu.visualize import sample_kent

    params = np.asarray(deg2kent(np.array([[200.0, 100.0, 60.0, 20.0]])))[0]
    g1, g2, g3 = (np.asarray(g).reshape(3)
                  for g in kent_angles_to_gammas(*params[2:5]))
    xs = sample_kent(params, 20000, seed=3)
    mean = xs.mean(0)
    mean /= np.linalg.norm(mean)
    assert mean @ g1 > 0.999
    assert np.var(xs @ g2) > 1.5 * np.var(xs @ g3)


def test_vis_kent_cli_writes_png(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "kent.png"
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vis_kent.py"),
         "--bfov", "120", "60", "40", "30", "--samples", "50",
         "--img-size", "64", "128", "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert out.exists() and out.stat().st_size > 1000


def test_kent_gamma_frame_numpy_twin_matches_jnp():
    """visualize.kent_vis keeps a numpy copy of kent_angles_to_gammas (so the
    package never touches jax); it must stay identical to the jnp original."""
    from sph_retina_tpu.iou.kent import kent_angles_to_gammas as jnp_frame
    from sph_retina_tpu.visualize.kent_vis import (
        kent_angles_to_gammas as np_frame,
    )

    rng = np.random.default_rng(0)
    angles = rng.uniform(-np.pi, np.pi, size=(16, 3))
    for alpha, psi, eta in angles:
        ref = [np.asarray(g) for g in jnp_frame(alpha, psi, eta)]
        got = np_frame(alpha, psi, eta)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g, r, atol=1e-6)
        # orthonormal frame
        q = np.stack(got)
        np.testing.assert_allclose(q @ q.T, np.eye(3), atol=1e-12)
