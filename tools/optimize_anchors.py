#!/usr/bin/env python
"""Optimize anchor FoV shapes on a dataset.

Counterpart of /root/reference/tools/analysis_tools/optimize_anchors.py
(YOLO k-means anchor cluster / scipy differential evolution): fits K
(alpha, beta) FoV pairs to the dataset's GT spherical boxes by maximizing
the average best spherical IoU, with both the k-means sweeps and the DE
population loop running jitted on device
(sph_retina_tpu/boxes/anchor_opt.py).

    python tools/optimize_anchors.py cfg.py --algorithm k-means
    python tools/optimize_anchors.py cfg.py --algorithm differential_evolution \
        --num-anchors 9 --iters 300 --output-dir anchor_opt/
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
    p.add_argument("--algorithm", default="differential_evolution",
                   choices=["k-means", "differential_evolution"])
    p.add_argument("--num-anchors", type=int, default=None,
                   help="K; default = the config's distinct base-anchor "
                        "FoV-pair count")
    p.add_argument("--iters", type=int, default=None,
                   help="k-means sweeps (default 25) or DE generations "
                        "(default 200)")
    p.add_argument("--backend", default="sph2pob_efficient")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use the in-memory synthetic dataset (smoke tests)")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import numpy as np

    from sph_retina_tpu.boxes.anchor_opt import (
        evolve_anchors,
        kmeans_anchors,
        mean_best_iou,
    )
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import load_config

    cfg = load_config(args.config)

    # ---- GT FoVs -----------------------------------------------------
    if args.synthetic:
        from sph_retina_tpu.data import make_synthetic_dataset

        ds = make_synthetic_dataset(
            n_images=64, num_classes=cfg["model"]["num_classes"],
            box_version=cfg["model"].get("box_version", 4), seed=args.seed)
    else:
        from sph_retina_tpu.data import SphCocoDataset

        d = cfg["data"]["train"]
        ds = SphCocoDataset(ann_file=d["ann_file"],
                            img_prefix=d.get("img_prefix", ""),
                            box_version=cfg["model"].get("box_version", 4))
    fovs = [it["boxes"][:, 2:4] for it in (ds[i] for i in range(len(ds)))
            if it["boxes"].shape[0]]
    gt_fovs = np.concatenate(fovs, axis=0)
    print(f"{gt_fovs.shape[0]} GT boxes from {len(ds)} images")

    # ---- current config anchors (the "before" score) ------------------
    base_fovs = None
    try:
        _, mcfg = get_family(cfg).build(cfg)
        anchors = np.asarray(mcfg.flat_anchors())
        base_fovs = np.unique(np.round(anchors[:, 2:4], 2), axis=0)
    except Exception as e:
        print(f"(config anchors unavailable: {type(e).__name__}: {e})")
    k = args.num_anchors or (len(base_fovs) if base_fovs is not None else 9)

    if base_fovs is not None:
        before = mean_best_iou(gt_fovs, base_fovs, args.backend)
        print(f"config anchors: K={len(base_fovs)} avg best IoU = {before:.4f}")

    # ---- optimize -----------------------------------------------------
    if args.algorithm == "k-means":
        out = kmeans_anchors(gt_fovs, k, iters=args.iters or 25,
                             seed=args.seed, backend=args.backend)
    else:
        out = evolve_anchors(gt_fovs, k, iters=args.iters or 200,
                             seed=args.seed, backend=args.backend)
    after = mean_best_iou(gt_fovs, out, args.backend)
    print(f"optimized anchors ({args.algorithm}): K={k} "
          f"avg best IoU = {after:.4f}")
    for a, b in out:
        print(f"  alpha={a:7.2f}  beta={b:7.2f}")

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        path = os.path.join(args.output_dir, "anchor_optimize_result.json")
        with open(path, "w") as f:
            json.dump({"algorithm": args.algorithm, "backend": args.backend,
                       "avg_best_iou": after,
                       "anchors_alpha_beta_deg": out.tolist()}, f, indent=2)
        print(f"saved {path}")


if __name__ == "__main__":
    main()
