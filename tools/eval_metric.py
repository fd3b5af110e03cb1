#!/usr/bin/env python
"""Offline metric evaluation of saved raw results.

Counterpart of /root/reference/tools/analysis_tools/eval_metric.py (there:
pkl results + dataset.evaluate; here: the npz written by
``tools/test.py --save-raw`` re-scored without re-running inference), so
different IoU backends / thresholds can be compared cheaply.

    python tools/test.py cfg.py ckpts --save-raw raw.npz
    python tools/eval_metric.py cfg.py raw.npz --iou-backend unbiased
    python tools/eval_metric.py cfg.py raw.npz --iou-thrs 0.5 0.75
    python tools/eval_metric.py cfg.py raw.npz --voc        # mmdet eval_map
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("raw", help="npz from tools/test.py --save-raw")
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    p.add_argument("--iou-thrs", type=float, nargs="*", default=None,
                   help="override the COCO 0.5:0.95 threshold sweep")
    p.add_argument("--voc", action="store_true",
                   help="VOC-style mAP (the reference's vendored eval_map "
                        "semantics, single threshold = first --iou-thrs "
                        "or 0.5) instead of COCO-style")
    p.add_argument("--out", default=None, help="write metrics JSON here")
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu", "axon"],
                   help="offline rescoring is tiny; default to cpu so the "
                        "tool never waits on a TPU tunnel")
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    from sph_retina_tpu.engine.analysis import _unpack, load_raw_results
    from sph_retina_tpu.engine.eval import eval_spherical_map
    from sph_retina_tpu.utils.config import load_config

    cfg = load_config(args.config)
    arrays = load_raw_results(args.raw)

    det_results, annotations = [], []
    for i in range(arrays["boxes"].shape[0]):
        boxes, scores, labels, gt_boxes, gt_labels = _unpack(arrays, i)
        det_results.append((boxes, scores, labels))
        annotations.append({"boxes": gt_boxes, "labels": gt_labels})

    if args.voc:
        from sph_retina_tpu.engine.eval import eval_voc_map

        metrics = eval_voc_map(
            det_results, annotations, cfg["model"]["num_classes"],
            iou_thr=(args.iou_thrs[0] if args.iou_thrs else 0.5),
            backend=args.iou_backend)
        summary = {"mAP": metrics["mAP"],
                   "per_class": metrics["per_class"]}
    else:
        kwargs = {}
        if args.iou_thrs:
            kwargs["iou_thrs"] = tuple(args.iou_thrs)
        metrics = eval_spherical_map(det_results, annotations,
                                     cfg["model"]["num_classes"],
                                     backend=args.iou_backend, **kwargs)
        summary = {k: v for k, v in metrics.items() if isinstance(v, float)}
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
