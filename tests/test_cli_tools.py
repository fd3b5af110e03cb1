"""Small pure-host CLI tools: convert_anno and analyze_logs.

Parity targets: /root/reference/tools/convert_anno.py (raw radian boxes ->
degree "chenbin" format) and /root/reference/tools/analysis_tools/
analyze_logs.py (curve plotting + train-time stats over the run log).
"""

import json
import math
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, timeout=300):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert p.returncode == 0, p.stdout[-2000:]
    return p.stdout


def test_convert_anno_radians_to_degrees(tmp_path):
    raw = {
        "images": [{"id": 1, "file_name": "a.png", "width": 8, "height": 4}],
        "annotations": [
            # lon=0, lat=0 (equator, prime meridian) -> theta=180, phi=90
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0.0, 0.0, 40.0, 20.0], "area": 1, "iscrowd": 0},
            # lon=-pi/2, lat=pi/4 -> theta=90, phi=45
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [-math.pi / 2, math.pi / 4, 30.0, 30.0], "area": 1,
             "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "x"}],
    }
    src = tmp_path / "raw.json"
    src.write_text(json.dumps(raw))
    out = tmp_path / "deg.json"
    _run(["tools/convert_anno.py", str(src), "--out", str(out)])
    deg = json.loads(out.read_text())
    b1, b2 = (a["bbox"] for a in deg["annotations"])
    assert b1[:2] == [180.0, 90.0] and b1[2:] == [40.0, 20.0]
    assert abs(b2[0] - 90.0) < 1e-9 and abs(b2[1] - 45.0) < 1e-9
    # in-place conversion (the documented default) also works
    _run(["tools/convert_anno.py", str(src)])
    again = json.loads(src.read_text())
    assert again["annotations"][0]["bbox"][:2] == [180.0, 90.0]


def test_analyze_logs_curves_and_train_time(tmp_path):
    log = tmp_path / "metrics.jsonl"
    records = []
    t = 1000.0
    for step in range(1, 9):
        t += 2.0 if step < 5 else 4.0
        records.append({"step": step, "prefix": "train",
                        "loss": 1.0 / step, "loss_cls": 0.5 / step,
                        "time": t})
    records.append({"step": 8, "prefix": "val", "AP50": 0.5, "time": t + 1})
    records.append({"step": 4, "prefix": "epoch", "epoch": 0,
                    "epoch_time": 2.0, "time": t + 2})
    records.append({"step": 8, "prefix": "epoch", "epoch": 1,
                    "epoch_time": 4.0, "time": t + 3})
    log.write_text("\n".join(json.dumps(r) for r in records) + "\n")

    png = tmp_path / "curves.png"
    out = _run(["tools/analyze_logs.py", "plot_curve", str(log),
                "--keys", "loss", "loss_cls", "--out", str(png)])
    assert png.exists() and png.stat().st_size > 0
    assert "saved" in out

    out = _run(["tools/analyze_logs.py", "cal_train_time", str(log)])
    assert "epochs: 2" in out and "mean: 3.00s" in out
    assert "fastest: 2.00s" in out and "slowest: 4.00s" in out


def test_benchmark_iou_smoke(tmp_path):
    """The headline-table harness runs on CPU at a tiny size and reports
    the oracle statistics (time, error stats, Pearson R) per backend."""
    out = _run(["tools/benchmark_iou.py", "--size", "500", "--iters", "2",
                "--backends", "sph2pob_efficient", "--device", "cpu"])
    line = [l for l in out.splitlines() if l.startswith("{")][0]
    rec = json.loads(line)
    assert rec["backend"] == "sph2pob_efficient"
    assert rec["pearson_r"] > 0.99
    assert rec["mean_err"] < 0.01


def test_benchmark_fps_smoke(tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "model = dict(type='SphRetinaNet', num_classes=3,\n"
        "             backbone=dict(depth=18))\n"
        "img_size = (64, 128)\n"
        "bf16 = False\n")
    out = _run(["tools/benchmark_fps.py", str(cfg), "--batch-size", "1",
                "--max-iter", "4", "--warmup", "1", "--device", "cpu"],
               timeout=600)
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["img_per_s"] > 0 and rec["batch_size"] == 1
    assert rec["img_size"] == [64, 128]


def test_profile_step_memory_smoke(tmp_path):
    """--memory compiles the train step with remat off/on and reports the
    XLA buffer-assignment delta (the remat HBM quantification path)."""
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "model = dict(type='SphRetinaNet', num_classes=3,\n"
        "             backbone=dict(depth=18))\n"
        "img_size = (64, 128)\n"
        "bf16 = False\n")
    out = _run(["tools/profile_step.py", str(cfg), "--memory",
                "--batch-size", "1", "--device", "cpu"], timeout=900)
    assert "remat=False" in out and "remat=True" in out
    assert "remat saves" in out or "unavailable" in out


def test_bench_host_pipeline_smoke(tmp_path):
    """Host-pipeline scaling bench: per-stage costs + loader img/s for both
    transfer colorspaces (no device)."""
    out_json = tmp_path / "host.json"
    out = _run(["tools/bench_host_pipeline.py", "--img-size", "64", "128",
                "--n-images", "8", "--workers", "1", "2",
                "--out", str(out_json)], timeout=600)
    rec = json.loads(out_json.read_text())
    assert rec["stages_single_thread"]["pil_decode_ms"] > 0
    for cs in ("rgb", "yuv420"):
        for nw in ("1", "2"):
            assert rec["loader_imgs_per_sec"][cs][nw] > 0
    assert "| workers | rgb img/s | yuv420 img/s |" in out


def test_transfer_colorspace_policy_resolves():
    """'auto' resolves via the measured-rate formula; injected probes make
    the decision deterministic in both directions."""
    from sph_retina_tpu.data.policy import resolve_transfer_colorspace

    slow_link = lambda: 3e6         # 3 MB/s tunnel
    fast_link = lambda: 10e9        # PCIe-class
    host = lambda img_size: {"rgb": 300.0, "yuv420": 250.0}
    assert resolve_transfer_colorspace(
        (512, 1024), probe_link=slow_link, probe_host=host) == "yuv420"
    assert resolve_transfer_colorspace(
        (512, 1024), probe_link=fast_link, probe_host=host) == "rgb"
    # probe failure -> safe rgb default
    def broken():
        raise OSError("no device")
    assert resolve_transfer_colorspace(
        (512, 1024), probe_link=broken, probe_host=host) == "rgb"


def test_mfu_experiment_harness_smoke(tmp_path):
    """MFU-levers harness (tools/mfu_experiment.py): parent-process plumbing
    only — an empty experiment list exercises arg parsing, result
    aggregation, and JSON emission without compiling on a device."""
    out_json = tmp_path / "mfu.json"
    out = _run(["tools/mfu_experiment.py", "--out", str(out_json),
                "--experiments"], timeout=120)
    assert json.loads(out_json.read_text()) == {}
    # every named experiment is either the baseline or a TPU compiler option
    from tools.mfu_experiment import EXPERIMENTS
    assert EXPERIMENTS["baseline"] is None
    for name, opts in EXPERIMENTS.items():
        if opts is not None:
            assert all(k.startswith("xla_tpu_") for k in opts)
