"""CLI smoke tests for the analysis tools added for reference parity
(/root/reference/tools/analysis_tools/{print_config,get_flops,
browse_dataset,eval_metric}.py)."""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from utils.synthetic_coco import write_synthetic_coco  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CFG_TMPL = """\
model = dict(type="SphRetinaNet", num_classes=3, backbone=dict(depth=18))
img_size = (64, 128)
bf16 = False
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    max_gt=8,
    train=dict(ann_file={ann!r}, img_prefix={img!r}),
    val=dict(ann_file={ann!r}, img_prefix={img!r}),
)
"""


def _run(args, timeout=600):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode == 0, p.stdout[-4000:]
    return p.stdout


def _cfg(tmp_path):
    ann, img_dir = write_synthetic_coco(str(tmp_path / "data"), n_images=4,
                                        num_classes=3)
    cfg_path = tmp_path / "tiny.py"
    cfg_path.write_text(CFG_TMPL.format(ann=ann, img=img_dir + "/"))
    return str(cfg_path)


def test_print_config(tmp_path):
    out = _run(["tools/print_config.py", _cfg(tmp_path),
                "--cfg-options", "optimizer.lr=0.02"])
    assert "'num_classes': 3" in out
    assert "0.02" in out


def test_get_flops(tmp_path):
    out = _run(["tools/get_flops.py", _cfg(tmp_path), "--device", "cpu"])
    assert "params:" in out and "flops:" in out
    # R18 backbone at 64x128 is ~11M params / multi-GFLOP forward
    assert "M" in out.split("params:")[1].splitlines()[0]


def test_browse_dataset(tmp_path):
    out_dir = tmp_path / "browsed"
    _run(["tools/browse_dataset.py", _cfg(tmp_path),
          "--out-dir", str(out_dir), "--max-images", "2"])
    pngs = list(out_dir.glob("*.png"))
    assert len(pngs) == 2


def test_eval_metric_offline_rescore(tmp_path):
    from sph_retina_tpu.engine.analysis import save_raw_results

    k, g = 4, 3
    det = np.ones((k, 4), np.float32)
    det[:3] = [[100, 90, 40, 40], [200, 90, 40, 40], [300, 90, 40, 40]]
    gt = np.ones((g, 4), np.float32)
    gt[:2] = [[100, 90, 40, 40], [200, 90, 40, 40]]
    arrays = {
        "boxes": det[None],
        "scores": np.array([[0.9, 0.8, 0.7, 0.0]], np.float32),
        "labels": np.array([[0, 1, 2, 0]], np.int32),
        "valid": np.array([[True, True, True, False]]),
        "gt_boxes": gt[None],
        "gt_labels": np.array([[0, 1, 0]], np.int32),
        "gt_mask": np.array([[True, True, False]]),
        "img_id": np.array([7], np.int64),
    }
    raw = tmp_path / "raw.npz"
    save_raw_results(str(raw), arrays)
    out_json = tmp_path / "m.json"
    _run(["tools/eval_metric.py", _cfg(tmp_path), str(raw),
          "--iou-thrs", "0.5", "--out", str(out_json)])
    m = json.loads(out_json.read_text())
    # classes 0 and 1 perfectly matched at IoU 0.5, class 2 is a pure FP
    assert m["AP50"] > 0.6


def test_optimize_anchors(tmp_path):
    out_dir = tmp_path / "anchor_opt"
    out = _run(["tools/optimize_anchors.py", _cfg(tmp_path),
                "--algorithm", "k-means", "--num-anchors", "3",
                "--iters", "10", "--device", "cpu",
                "--output-dir", str(out_dir)])
    assert "optimized anchors (k-means): K=3" in out
    result = json.loads((out_dir / "anchor_optimize_result.json").read_text())
    assert len(result["anchors_alpha_beta_deg"]) == 3
    assert 0.0 < result["avg_best_iou"] <= 1.0


def test_coco_error_analysis(tmp_path):
    from sph_retina_tpu.engine.analysis import save_raw_results

    det = np.array([[[100, 90, 40, 40], [206, 96, 40, 40],
                     [40, 90, 40, 40], [120, 20, 30, 30]]], np.float32)
    arrays = {
        "boxes": det,
        "scores": np.array([[0.9, 0.7, 0.8, 0.85]], np.float32),
        "labels": np.zeros((1, 4), np.int32),
        "valid": np.ones((1, 4), bool),
        "gt_boxes": np.array([[[100, 90, 40, 40], [200, 90, 40, 40],
                               [300, 90, 40, 40], [40, 90, 40, 40]]],
                             np.float32),
        "gt_labels": np.array([[0, 0, 0, 1]], np.int32),
        "gt_mask": np.ones((1, 4), bool),
        "img_id": np.array([0], np.int64),
    }
    raw = tmp_path / "raw.npz"
    save_raw_results(str(raw), arrays)
    out_dir = tmp_path / "err"
    out = _run(["tools/coco_error_analysis.py", _cfg(tmp_path), str(raw),
                str(out_dir), "--backend", "sph2pob_efficient",
                "--device", "cpu"])
    assert "mean AP per error rung" in out
    assert (out_dir / "bbox-allclass-allarea.png").exists()
    summary = json.loads((out_dir / "error_analysis.json").read_text())
    assert summary["FN"] == 1.0 and summary["C75"] <= summary["C50"]
