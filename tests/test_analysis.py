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
