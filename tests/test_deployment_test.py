"""Deployed-artifact evaluation tool (tools/deployment/test.py parity).

Exports a tiny random-init detector with tools/export_model.py, scores the
artifact over the synthetic dataset with tools/deployment_test.py, and
checks the numbers agree with evaluating the same weights through the
in-framework predict path — the artifact is the whole model, so any
decode/NMS divergence in export would show up as a metric mismatch.
"""

import json
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


def _run(cmd):
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       env={**os.environ, "XLA_FLAGS": ""}, timeout=600)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return r.stdout


def test_deployment_test_matches_in_framework_eval(tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(CFG)
    artifact = tmp_path / "model.stablehlo"
    out_json = tmp_path / "res.json"

    _run([sys.executable, "tools/export_model.py", str(cfg), "none",
          str(artifact), "--batch-size", "4", "--device", "cpu"])
    assert artifact.stat().st_size > 0

    _run([sys.executable, "tools/deployment_test.py", str(cfg),
          str(artifact), "--synthetic", "--device", "cpu",
          "--out", str(out_json)])
    deployed = json.loads(out_json.read_text())
    assert "AP50" in deployed

    # same weights through the in-framework jitted predict path
    import jax

    from sph_retina_tpu.apis import init_detector
    from sph_retina_tpu.data import DataLoader, SphPipeline, \
        make_synthetic_dataset
    from sph_retina_tpu.engine.evaluator import evaluate_dataset

    det = init_detector(str(cfg))  # same random init as checkpoint 'none'
    ds = make_synthetic_dataset(n_images=16, num_classes=3,
                                img_size=(64, 128), box_version=4)
    pipe = SphPipeline(img_size=(64, 128), training=False, box_version=4)
    loader = DataLoader(ds, pipe, batch_size=4, shuffle=False,
                        drop_last=False)
    expected = evaluate_dataset(det.model, det.det_cfg, det.variables,
                                loader, predict=det.predict)
    for k, v in expected.items():
        if isinstance(v, float) and np.isfinite(v):
            assert abs(deployed[k] - v) < 1e-3, (k, deployed[k], v)
