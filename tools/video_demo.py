#!/usr/bin/env python
"""Run a detector over an ERP video and render the results.

Counterpart of /root/reference/demo/video_demo.py (frame loop, draw, write
an output video). TPU-first difference: frames are batched before each
device dispatch (``--batch``) instead of the reference's one-forward-per-
frame loop, so the MXU sees full batches and the tunnel is crossed once per
batch.

    python tools/video_demo.py in.mp4 cfg.py ckpt --out out.mp4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="Spherical video demo")
    p.add_argument("video")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", required=True, help="output video file")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--max-frames", type=int, default=0,
                   help="stop after N frames (0 = all)")
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import cv2

    from sph_retina_tpu.apis import inference_detector, init_detector, show_result

    det = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video: {args.video}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = None

    def flush(frames):
        nonlocal writer
        if not frames:
            return 0
        # pad a ragged tail to the compiled batch shape: a (k, H, W, 3)
        # call with k < batch would retrace + recompile the whole detector
        # just for the leftover frames.
        n_real = len(frames)
        padded = frames + [frames[-1]] * (args.batch - n_real)
        results = inference_detector(det, padded)[:n_real]
        for frame, result in zip(frames, results):
            drawn = show_result(det, frame, result, score_thr=args.score_thr)
            if writer is None:
                h, w = drawn.shape[:2]
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            writer.write(cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
        return len(frames)

    n_done, batch = 0, []
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        batch.append(cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB))
        if len(batch) == args.batch:
            n_done += flush(batch)
            batch = []
            print(f"\r{n_done} frames", end="", flush=True)
        if args.max_frames and n_done + len(batch) >= args.max_frames:
            break
    n_done += flush(batch)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"\n{n_done} frames -> {args.out}")


if __name__ == "__main__":
    main()
