#!/usr/bin/env python
"""Export a trained detector's predict path as a StableHLO artifact.

The serving-path analogue of the reference's ONNX export (mmdet
tests/test_onnx): one serialized module containing backbone + FPN + head +
decode + NMS with the weights baked in.

    python tools/export_model.py cfg.py work_dirs/x/ckpts out.stablehlo \
        --batch-size 1 --platform tpu
    python tools/export_model.py cfg.py none out.stablehlo --run demo.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir, or 'none'")
    p.add_argument("out", help="output artifact path")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--platform", nargs="*", default=None,
                   help="lowering targets, e.g. --platform cpu tpu")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--run", default=None,
                   help="optionally run the artifact on this image and "
                        "print the detection count")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    from sph_retina_tpu.apis import init_detector
    from sph_retina_tpu.export import export_predict, load_exported

    ckpt = None if args.checkpoint.lower() == "none" else args.checkpoint
    det = init_detector(args.config, ckpt, cfg_options=args.cfg_options)
    blob = export_predict(det, batch_size=args.batch_size,
                          platforms=args.platform)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out}")

    if args.run:
        import numpy as np

        from sph_retina_tpu.apis import _prepare

        call = load_exported(blob)
        _, img = _prepare(det, args.run)
        batch = np.tile(img[None], (args.batch_size, 1, 1, 1))
        boxes, scores, labels, inds, valid = call(batch)
        print(f"artifact ran: {int(np.asarray(valid)[0].sum())} detections "
              f"in image 0")


if __name__ == "__main__":
    main()
