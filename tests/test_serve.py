"""HTTP inference server (torchserve deployment-path parity)."""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CFG = """\
model = dict(type="SphRetinaNet", num_classes=2, backbone=dict(depth=18))
img_size = (64, 128)
bf16 = False
classes = ("person", "chair")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_serve_ping_and_predict(tmp_path):
    from PIL import Image

    cfg = tmp_path / "cfg.py"
    cfg.write_text(CFG)
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", str(cfg), "--device", "cpu",
         "--port", str(port), "--score-thr", "0.0"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env={**os.environ, "XLA_FLAGS": ""})
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):  # wait for warmup + bind
            try:
                with urllib.request.urlopen(base + "/ping", timeout=2) as r:
                    assert json.load(r)["status"] == "ok"
                break
            except OSError:
                assert proc.poll() is None, proc.stdout.read()[-3000:]
                time.sleep(2)
        else:
            raise AssertionError("server never came up")

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (64, 128, 3),
                                              np.uint8)).save(buf, "PNG")
        raw = buf.getvalue()

        # raw-bytes body
        req = urllib.request.Request(base + "/predict", data=raw,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            dets = json.load(r)
        assert isinstance(dets, list)
        for d in dets:
            assert set(d) == {"class_name", "bbox", "score"}
            assert d["class_name"] in ("person", "chair")
            assert len(d["bbox"]) == 4

        # base64-JSON body (torchserve handler parity)
        req = urllib.request.Request(
            base + "/predict",
            data=json.dumps(
                {"data": base64.b64encode(raw).decode()}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            dets2 = json.load(r)
        assert dets2 == dets  # same image, same (deterministic) detections

        # malformed body -> 400 with an error record, server survives
        req = urllib.request.Request(base + "/predict", data=b"not an image",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/ping", timeout=5) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        proc.terminate()
        proc.wait(timeout=10)
