"""Video demo, GIF assembly, occluded/separated recall.

Parity: /root/reference/demo/video_demo.py, demo/create_result_gif.py,
tools/analysis_tools/coco_occluded_separated_recall.py (box-adapted).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CFG = """\
model = dict(type="SphRetinaNet", num_classes=3, backbone=dict(depth=18))
img_size = (64, 128)
bf16 = False
"""


def _run(args, timeout=600):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode == 0, p.stdout[-4000:]
    return p.stdout


def _pad(rows, k, d=4):
    out = np.ones((k, d), np.float32)
    if len(rows):
        out[: len(rows)] = rows
    return out


def test_occluded_separated_recall_definitions():
    from sph_retina_tpu.engine.analysis import occluded_separated_recall

    # GT 0+1 overlap heavily (both occluded); GT 2 crosses the ERP seam
    # (separated); GT 3 is plain. Dets recall 0 and 2 only.
    k, g = 4, 4
    gt = _pad([[100, 90, 40, 40], [115, 90, 40, 40],
               [2, 90, 30, 30], [200, 90, 30, 30]], g)
    det = _pad([[100, 90, 40, 40], [2, 90, 30, 30], [300, 20, 10, 10]], k)
    arrays = {
        "boxes": det[None],
        "scores": np.array([[0.9, 0.8, 0.7, 0.0]], np.float32),
        "labels": np.array([[0, 1, 2, 0]], np.int32),
        "valid": np.array([[True, True, True, False]]),
        "gt_boxes": gt[None],
        "gt_labels": np.array([[0, 0, 1, 2]], np.int32),
        "gt_mask": np.array([[True, True, True, True]]),
        "img_id": np.array([1], np.int64),
    }
    res = occluded_separated_recall(arrays, iou_thr=0.75, score_thr=0.3)
    assert res["occluded_total"] == 2      # GT 0 and 1
    assert res["separated_total"] == 1     # GT 2
    assert res["all_total"] == 4
    assert res["occluded_recall"] == 0.5   # only GT 0 recalled
    assert res["separated_recall"] == 1.0  # GT 2 recalled
    assert res["all_recall"] == 0.5        # GT 0 + GT 2 of 4


def test_occluded_recall_cli(tmp_path):
    from sph_retina_tpu.engine.analysis import save_raw_results

    k = 2
    arrays = {
        "boxes": _pad([[100, 90, 40, 40]], k)[None],
        "scores": np.array([[0.9, 0.0]], np.float32),
        "labels": np.array([[0, 0]], np.int32),
        "valid": np.array([[True, False]]),
        "gt_boxes": _pad([[100, 90, 40, 40]], k)[None],
        "gt_labels": np.array([[0, 0]], np.int32),
        "gt_mask": np.array([[True, False]]),
        "img_id": np.array([1], np.int64),
    }
    raw = str(tmp_path / "raw.npz")
    save_raw_results(raw, arrays)
    out = str(tmp_path / "rec.json")
    text = _run(["tools/occluded_recall.py", raw, "--out", out,
                 "--device", "cpu"])
    assert "all" in text and os.path.exists(out)
    import json

    res = json.loads(open(out).read())
    assert res["all_recall"] == 1.0 and res["occluded_total"] == 0


def test_create_result_gif(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "gallery" / "good"
    os.makedirs(img_dir)
    for i in range(3):
        Image.fromarray(
            np.full((16, 32, 3), i * 60, np.uint8)).save(img_dir / f"{i}.png")
    gif = str(tmp_path / "result.gif")
    _run(["tools/create_result_gif.py", str(tmp_path / "gallery"),
          "--out", gif, "--ncols", "2"])
    import imageio

    frames = imageio.mimread(gif)
    assert len(frames) == 2  # 3 images tiled 2-wide -> 2 frames
    assert frames[0].shape[1] == 64


def test_video_demo(tmp_path):
    import cv2

    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (128, 64))
    rng = np.random.default_rng(0)
    for _ in range(5):
        w.write(rng.integers(0, 255, (64, 128, 3), np.uint8))
    w.release()
    cfg = tmp_path / "cfg.py"
    cfg.write_text(CFG)
    out = str(tmp_path / "out.mp4")
    text = _run(["tools/video_demo.py", vid, str(cfg), "--device", "cpu",
                 "--batch", "2", "--out", out])
    assert "5 frames" in text and os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_webcam_demo_headless_on_file_source(tmp_path):
    # Parity: /root/reference/demo/webcam_demo.py; --source/--out exercise
    # the camera loop headlessly on machines without a capture device.
    import cv2

    vid = str(tmp_path / "cam.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (128, 64))
    rng = np.random.default_rng(1)
    for _ in range(4):
        w.write(rng.integers(0, 255, (64, 128, 3), np.uint8))
    w.release()
    cfg = tmp_path / "cfg.py"
    cfg.write_text(CFG)
    out = tmp_path / "shots"
    text = _run(["tools/webcam_demo.py", str(cfg), "--device", "cpu",
                 "--source", vid, "--out", str(out), "--max-frames", "3"])
    assert "3 frames processed" in text
    assert sorted(os.listdir(out)) == [
        "frame_000001.jpg", "frame_000002.jpg", "frame_000003.jpg"]
