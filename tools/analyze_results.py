#!/usr/bin/env python
"""Rank predictions per image and save the best/worst visualizations.

Counterpart of /root/reference/tools/analysis_tools/analyze_results.py
(per-image mAP ranking, top-k "good" and "bad" galleries), operating on the
npz written by ``tools/test.py --save-raw`` and re-reading the ERP images
through the dataset to draw GT (green) vs predictions (red).

    python tools/analyze_results.py cfg.py raw.npz out_dir --topk 5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("raw", help="npz from tools/test.py --save-raw")
    p.add_argument("out_dir")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--show-score-thr", type=float, default=0.3)
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    args = p.parse_args()

    import numpy as np

    from sph_retina_tpu.data import SphCocoDataset, SphPipeline
    from sph_retina_tpu.engine.analysis import load_raw_results, per_image_scores
    from sph_retina_tpu.utils.config import load_config
    from sph_retina_tpu.visualize.sph_draw import draw_boxes

    cfg = load_config(args.config)
    nc = cfg["model"]["num_classes"]
    arrays = load_raw_results(args.raw)
    scores = per_image_scores(arrays, nc, backend=args.iou_backend)

    d = cfg["data"]["test"]
    ds = SphCocoDataset(ann_file=d["ann_file"],
                        img_prefix=d.get("img_prefix", ""),
                        box_version=cfg["model"].get("box_version", 4))
    by_id = {int(ds[i]["img_id"]): i for i in range(len(ds))}
    pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                       training=False)

    order = np.argsort(scores)
    picks = [("bad", order[: args.topk]), ("good", order[-args.topk:][::-1])]
    for kind, idxs in picks:
        out = os.path.join(args.out_dir, kind)
        os.makedirs(out, exist_ok=True)
        for rank, i in enumerate(idxs):
            img_id = int(arrays["img_id"][i])
            if img_id not in by_id:
                continue
            item = ds[by_id[img_id]]
            img = pipe.resize(pipe.load_image(item["img_path"])).copy()
            # GT in green
            img = draw_boxes(img, item["boxes"], labels=item["labels"],
                             color=(0, 220, 0))
            # predictions over the display threshold in red, with scores
            v = arrays["valid"][i].astype(bool) & (
                arrays["scores"][i] >= args.show_score_thr)
            img = draw_boxes(img, arrays["boxes"][i][v],
                             labels=arrays["labels"][i][v].astype(int),
                             scores=arrays["scores"][i][v],
                             color=(230, 30, 30))
            from PIL import Image

            name = f"{rank:02d}_map{scores[i]:.3f}_img{img_id}.png"
            Image.fromarray(img).save(os.path.join(out, name))
        print(f"{kind}: {len(idxs)} images -> {out}")
    print(f"per-image mAP: mean={scores.mean():.4f} "
          f"min={scores.min():.4f} max={scores.max():.4f}")


if __name__ == "__main__":
    main()
