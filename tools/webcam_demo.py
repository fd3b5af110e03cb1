#!/usr/bin/env python
"""Live camera demo: detect spherical boxes on a camera stream.

Counterpart of /root/reference/demo/webcam_demo.py (cv2.VideoCapture loop,
imshow window, Esc to quit). Additions here: ``--source`` also accepts a
video file or stream URL (useful on machines without a camera), and
``--out``/headless mode writes annotated frames instead of opening a
window, so the tool runs over ssh and in CI.

    python tools/webcam_demo.py cfg.py ckpt --camera-id 0
    python tools/webcam_demo.py cfg.py ckpt --source pano.mp4 --out shots/ --max-frames 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="Spherical webcam demo")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--source", default=None,
                   help="video file / stream URL instead of the camera")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", default=None,
                   help="directory for annotated frames (headless mode; "
                        "no window is opened)")
    p.add_argument("--max-frames", type=int, default=0,
                   help="stop after N frames (0 = run until Esc/EOF)")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import cv2

    from sph_retina_tpu.apis import (
        inference_detector,
        init_detector,
        show_result,
    )

    det = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(
        args.source if args.source is not None else args.camera_id)
    if not cap.isOpened():
        raise SystemExit(
            f"cannot open {'source ' + args.source if args.source else 'camera %d' % args.camera_id}")
    if args.out:
        os.makedirs(args.out, exist_ok=True)

    print("Press Esc/q to quit." if not args.out else
          f"Writing annotated frames to {args.out}", flush=True)
    n = 0
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        result = inference_detector(det, rgb)
        drawn = show_result(det, rgb, result, score_thr=args.score_thr)
        n += 1
        if args.out:
            cv2.imwrite(os.path.join(args.out, f"frame_{n:06d}.jpg"),
                        cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
        else:
            cv2.imshow("sph_retina_tpu", cv2.cvtColor(drawn,
                                                      cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF in (27, ord("q")):
                break
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if not args.out:
        cv2.destroyAllWindows()
    print(f"{n} frames processed")


if __name__ == "__main__":
    main()
