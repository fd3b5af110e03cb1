#!/usr/bin/env python
"""Precision-recall curves from a checkpoint (eval_pr_curve.py parity).

    python tools/eval_pr_curve.py <config> <ckpt_dir> --iou-thr 0.5 \
        --out pr_curves.png [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    p.add_argument("--out", default="pr_curves.png")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.data import DataLoader, SphPipeline, make_synthetic_dataset
    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.eval import (
        _average_precision, _pairwise_iou_np,
    )
    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    if args.synthetic:
        ds = make_synthetic_dataset(
            n_images=16, num_classes=cfg["model"]["num_classes"],
            img_size=tuple(cfg.get("img_size", (512, 1024))))
        pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                           training=False)
        loader = DataLoader(ds, pipe, batch_size=4, shuffle=False,
                            drop_last=False)
    else:
        _, loader = build_datasets(cfg, "test")

    tx = build_tx(cfg, 1)
    h, w = cfg.get("img_size", (512, 1024))
    variables0 = family.init(model, jax.random.PRNGKey(0),
                             jnp.zeros((1, h, w, 3)))
    state = TrainState(jnp.zeros((), jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))
    state = Checkpointer(args.checkpoint).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(family.predict_fn(model, det_cfg))

    dets, anns = [], []
    for batch in loader.epoch(0):
        res = predict(variables, jnp.asarray(batch["images"]))
        for i in range(batch["images"].shape[0]):
            v = np.asarray(res.valid[i])
            dets.append((np.asarray(res.boxes[i])[v],
                         np.asarray(res.scores[i])[v],
                         np.asarray(res.labels[i])[v]))
            m = batch["gt_mask"][i]
            anns.append({"boxes": batch["gt_boxes"][i][m],
                         "labels": batch["gt_labels"][i][m]})

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nc = cfg["model"]["num_classes"]
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in range(nc):
        recs = []
        n_gt = 0
        matched = []
        for i, ((boxes, scores, labels), ann) in enumerate(zip(dets, anns)):
            gt_idx = np.where(np.asarray(ann["labels"]) == c)[0]
            matched.append(np.zeros(len(gt_idx), bool))
            n_gt += len(gt_idx)
            for k in np.where(labels == c)[0]:
                recs.append((float(scores[k]), i, int(k), gt_idx))
        if n_gt == 0:
            continue
        recs.sort(key=lambda r: -r[0])
        tp = np.zeros(len(recs))
        for r_i, (_, img, k, gt_idx) in enumerate(recs):
            if len(gt_idx) == 0:
                continue
            boxes, _, _ = dets[img]
            ious = _pairwise_iou_np(boxes[k:k + 1],
                                    np.asarray(anns[img]["boxes"])[gt_idx],
                                    args.iou_backend)[0]
            cand = np.where(~matched[img], ious, -1.0)
            best = int(np.argmax(cand)) if len(cand) else -1
            if best >= 0 and cand[best] >= args.iou_thr:
                matched[img][best] = True
                tp[r_i] = 1
        ctp = np.cumsum(tp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(np.arange(1, len(recs) + 1), 1)
        ap = _average_precision(recall, precision)
        ax.plot(recall, precision, label=f"class {c} (AP={ap:.3f})")
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.05)
    ax.legend(fontsize=7)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
