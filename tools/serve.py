#!/usr/bin/env python
"""Minimal HTTP inference server for spherical detectors.

Counterpart of the reference's TorchServe deployment path
(/root/reference/tools/deployment/mmdet2torchserve.py + mmdet_handler.py +
deployment/test.py): one process serving detection over HTTP with the same
response schema as the reference handler (per-detection
``{"class_name", "bbox", "score"}`` records). Serving-side the model is the
jitted predict function from ``init_detector`` — compiled once, reused for
every request; batch endpoint crosses the device boundary once per request.

    python tools/serve.py cfg.py model-abcd1234.npz --port 8080
    curl -X POST --data-binary @pano.jpg localhost:8080/predict

Endpoints:
- ``GET  /ping``     -> {"status": "ok"}   (torchserve health-check parity)
- ``POST /predict``  -> body = raw image bytes (jpg/png) or JSON
  ``{"data": "<base64>"}``; response = list of detection records.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_handler(det, classes, score_thr):
    import numpy as np
    from PIL import Image

    from sph_retina_tpu.apis import inference_detector

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/ping":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                raw = self.rfile.read(
                    int(self.headers.get("Content-Length", 0)))
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    raw = base64.b64decode(json.loads(raw)["data"])
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
                result = inference_detector(det, img)
                out = []
                for c, dets in enumerate(result):
                    name = classes[c] if classes and c < len(classes) \
                        else str(c)
                    for row in dets:
                        score = float(row[-1])
                        if score >= score_thr:
                            out.append({"class_name": name,
                                        "bbox": [float(v) for v in row[:-1]],
                                        "score": score})
                self._send(200, out)
            except Exception as e:  # noqa: BLE001 - report to the client
                self._send(400, {"error": str(e)})

    return Handler


def main():
    p = argparse.ArgumentParser(description="Serve a spherical detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="published .npz or orbax checkpoint dir")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--score-thr", type=float, default=0.5)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import numpy as np

    from sph_retina_tpu.apis import inference_detector, init_detector

    det = init_detector(args.config, args.checkpoint)
    classes = det.cfg.get("classes") or det.cfg.get("data", {}).get("classes")
    # warm the jit cache so the first request doesn't pay the compile
    h, w = det.cfg.get("img_size", (512, 1024))
    inference_detector(det, np.zeros((h, w, 3), np.uint8))

    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(det, classes, args.score_thr))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(POST /predict, GET /ping)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
