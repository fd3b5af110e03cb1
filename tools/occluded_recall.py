#!/usr/bin/env python
"""Recall on occluded / ERP-seam-separated ground truth.

Spherical-box counterpart of /root/reference/tools/analysis_tools/
coco_occluded_separated_recall.py (that tool is mask-only; see
``sph_retina_tpu.engine.analysis.occluded_separated_recall`` for the
box-native definitions). Consumes the npz from ``tools/test.py --save-raw``.

    python tools/occluded_recall.py raw.npz --out recall.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("raw", help="npz from tools/test.py --save-raw")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--iou-thr", type=float, default=0.75)
    p.add_argument("--occ-iou-thr", type=float, default=0.1)
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    p.add_argument("--out", default=None, help="save the metrics as JSON")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    from sph_retina_tpu.engine.analysis import (
        load_raw_results,
        occluded_separated_recall,
    )

    res = occluded_separated_recall(
        load_raw_results(args.raw), score_thr=args.score_thr,
        iou_thr=args.iou_thr, occ_iou_thr=args.occ_iou_thr,
        backend=args.iou_backend)
    for name in ("occluded", "separated", "all"):
        print(f"{name:>10}: recall "
              f"{res[f'{name}_recall']:.4f} over {res[f'{name}_total']} GT")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
        print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
