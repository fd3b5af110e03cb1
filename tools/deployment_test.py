#!/usr/bin/env python
"""Evaluate an exported StableHLO artifact over a dataset.

Deployment-path counterpart of /root/reference/tools/deployment/test.py,
which runs an exported ONNX/TensorRT model through the test dataset and
scores it with the same metrics as the in-framework model. Here the
artifact is the StableHLO module written by tools/export_model.py (the
whole predict path with weights baked in); it is executed on the current
backend and scored with the standard spherical-IoU COCO-style mAP, so the
printed numbers are directly comparable with tools/test.py on the source
checkpoint.

    python tools/deployment_test.py cfg.py model.stablehlo --eval bbox
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
    p.add_argument("artifact", help="StableHLO file from tools/export_model.py")
    p.add_argument("--eval", default="bbox")
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    import numpy as np
    from jax import export as jexport

    from sph_retina_tpu.boxes.nms import NMSResult
    from sph_retina_tpu.data import (DataLoader, SphPipeline,
                                     make_synthetic_dataset)
    from sph_retina_tpu.engine.builder import build_datasets
    from sph_retina_tpu.engine.evaluator import evaluate_dataset
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    family = get_family(cfg)
    model, det_cfg = family.build(cfg)

    with open(args.artifact, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    batch_size, h, w, _ = exp.in_avals[0].shape
    if (h, w) != tuple(cfg.get("img_size", (512, 1024))):
        raise SystemExit(
            f"artifact was exported at img_size {(h, w)} but the config "
            f"says {tuple(cfg.get('img_size', (512, 1024)))}")

    if args.synthetic:
        ds = make_synthetic_dataset(
            n_images=16, num_classes=cfg["model"]["num_classes"],
            img_size=(h, w),
            box_version=cfg["model"].get("box_version", 4))
        pipe = SphPipeline(img_size=(h, w), training=False,
                          box_version=cfg["model"].get("box_version", 4))
        loader = DataLoader(ds, pipe, batch_size=batch_size, shuffle=False,
                            drop_last=False)
    else:
        # the loader must batch exactly at the artifact's baked-in batch dim
        cfg.setdefault("data", {})["samples_per_gpu"] = batch_size
        _, loader = build_datasets(cfg, "test")

    def predict(_variables, images):
        # the artifact has a fixed batch dim: pad a ragged final batch up,
        # run, slice back
        images = np.asarray(images)
        n = images.shape[0]
        if n < batch_size:
            images = np.concatenate(
                [images, np.zeros((batch_size - n, *images.shape[1:]),
                                  images.dtype)])
        out = exp.call(images)
        return NMSResult(*(np.asarray(o)[:n] for o in out))

    results = evaluate_dataset(model, det_cfg, {}, loader,
                               backend=args.iou_backend, predict=predict)
    summary = {k: v for k, v in results.items() if isinstance(v, float)}
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
