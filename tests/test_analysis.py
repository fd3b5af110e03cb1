"""Result-analysis tools: IoU-matched confusion matrix + per-image scores
(counterparts of /root/reference/tools/analysis_tools/confusion_matrix.py
and analyze_results.py)."""

import numpy as np

from sph_retina_tpu.engine.analysis import (
    confusion_matrix,
    load_raw_results,
    per_image_scores,
    save_raw_results,
)


def _pad(rows, k, d=4):
    out = np.ones((k, d), np.float32)
    if len(rows):
        out[: len(rows)] = rows
    return out


def _arrays():
    """One image, 2 classes. GT: class0 @ theta=100, class1 @ theta=200.
    Dets: perfect class0 match; class1 box mislabeled as 0; pure FP."""
    k, g = 4, 3
    det_boxes = _pad([[100, 90, 40, 40], [200, 90, 40, 40],
                      [300, 90, 40, 40]], k)
    gt_boxes = _pad([[100, 90, 40, 40], [200, 90, 40, 40]], g)
    return {
        "boxes": det_boxes[None],
        "scores": np.array([[0.9, 0.8, 0.7, 0.0]], np.float32),
        "labels": np.array([[0, 0, 1, 0]], np.int32),
        "valid": np.array([[True, True, True, False]]),
        "gt_boxes": gt_boxes[None],
        "gt_labels": np.array([[0, 1, 0]], np.int32),
        "gt_mask": np.array([[True, True, False]]),
        "img_id": np.array([7], np.int64),
    }


def test_confusion_matrix_exact():
    cm = confusion_matrix(_arrays(), 2, score_thr=0.3, iou_thr=0.5)
    expected = np.array([
        [1, 0, 0],   # gt class0 -> pred class0
        [1, 0, 0],   # gt class1 matched by a det labeled class0
        [0, 1, 0],   # background FP predicted class1
    ])
    np.testing.assert_array_equal(cm, expected)


def test_confusion_matrix_score_threshold_drops_dets():
    cm = confusion_matrix(_arrays(), 2, score_thr=0.85, iou_thr=0.5)
    # only the 0.9 det survives; both other GT are missed
    expected = np.array([
        [1, 0, 0],
        [0, 0, 1],
        [0, 0, 0],
    ])
    np.testing.assert_array_equal(cm, expected)


def test_per_image_scores_orders_quality():
    a = _arrays()
    good = dict(a)  # perfect labeling variant
    good["labels"] = np.array([[0, 1, 1, 0]], np.int32)
    good["valid"] = np.array([[True, True, False, False]])
    s_bad = per_image_scores(a, 2)
    s_good = per_image_scores(good, 2)
    assert s_good[0] > s_bad[0]
    assert s_good[0] == 1.0


def test_raw_results_roundtrip(tmp_path):
    a = _arrays()
    path = str(tmp_path / "raw.npz")
    save_raw_results(path, a)
    b = load_raw_results(path)
    assert set(b) == set(a)
    np.testing.assert_array_equal(b["boxes"], a["boxes"])


def test_analyze_results_compare_mode(tmp_path):
    """--compare (analyze_results_v2 parity): rank by per-image mAP delta
    between two raw result sets and save both models' galleries."""
    import glob
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from utils.synthetic_coco import write_synthetic_coco

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    ann, img_dir = write_synthetic_coco(str(tmp_path / "data"), n_images=4,
                                        num_classes=2, img_size=(32, 64))
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        f"model = dict(type='SphRetinaNet', num_classes=2)\n"
        f"img_size = (32, 64)\n"
        f"data = dict(test=dict(ann_file={ann!r}, img_prefix={img_dir + '/'!r}))\n")

    from sph_retina_tpu.data import SphCocoDataset

    ds = SphCocoDataset(ann_file=ann, img_prefix=img_dir + "/")
    k = 4

    def raws(perturb_ids):
        n = len(ds)
        a = {"boxes": np.ones((n, k, 4), np.float32),
             "scores": np.zeros((n, k), np.float32),
             "labels": np.zeros((n, k), np.int32),
             "valid": np.zeros((n, k), bool),
             "gt_boxes": np.ones((n, k, 4), np.float32),
             "gt_labels": np.zeros((n, k), np.int32),
             "gt_mask": np.zeros((n, k), bool),
             "img_id": np.zeros((n,), np.int64)}
        for i in range(n):
            item = ds[i]
            g = min(len(item["boxes"]), k)
            a["img_id"][i] = item["img_id"]
            a["gt_boxes"][i, :g] = item["boxes"][:g]
            a["gt_labels"][i, :g] = item["labels"][:g]
            a["gt_mask"][i, :g] = True
            det = np.array(item["boxes"][:g], np.float32)
            if int(item["img_id"]) in perturb_ids:
                det[:, 0] = (det[:, 0] + 90.0) % 360.0  # miss: shift 90 deg
            a["boxes"][i, :g] = det
            a["scores"][i, :g] = 0.9
            a["labels"][i, :g] = item["labels"][:g]
            a["valid"][i, :g] = True
        return a

    raw1, raw2 = str(tmp_path / "r1.npz"), str(tmp_path / "r2.npz")
    save_raw_results(raw1, raws(perturb_ids=()))         # model1 perfect
    save_raw_results(raw2, raws(perturb_ids=(3, 4)))      # model2 misses 2
    out_dir = tmp_path / "cmp"
    p = subprocess.run(
        [sys.executable, "tools/analyze_results.py", str(cfg_path),
         raw1, str(out_dir), "--compare", raw2, "--topk", "2"],
        cwd=repo, timeout=300, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": "", "JAX_PLATFORMS": "cpu"})
    assert p.returncode == 0, p.stdout[-3000:]
    assert "per-image mAP delta" in p.stdout
    m1b = glob.glob(str(out_dir / "model1_better" / "*.png"))
    assert len(m1b) == 4  # topk=2 images x both models
    assert any(f.endswith("_m1.png") for f in m1b)
    assert any(f.endswith("_m2.png") for f in m1b)
    # the improved images are exactly the perturbed ones, delta +1.0
    names = sorted(os.path.basename(f) for f in m1b)
    assert all("dmap+1.000" in f for f in names)
    got_ids = {f.split("img")[1].split("_")[0] for f in names}
    assert got_ids == {"3", "4"}


def test_metric_logger_wandb_degrades_gracefully(tmp_path):
    """wandb is opt-in config; when the package is absent the logger must
    still write JSONL/TB without error (WandbLoggerHook parity)."""
    import json

    from sph_retina_tpu.engine.runner import MetricLogger

    lg = MetricLogger(str(tmp_path), wandb_init={"project": "x"})
    lg.log(1, {"loss": 0.5})
    lg.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(lines[-1])["loss"] == 0.5
