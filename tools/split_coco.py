#!/usr/bin/env python
"""K-fold labeled/unlabeled splits of a COCO-style annotation file.

Counterpart of /root/reference/tools/misc/split_coco.py (semi-supervised
splits: per fold and labeled-percent, write a labeled JSON plus the
complementary unlabeled JSON).

    python tools/split_coco.py ann.json out_dir --labeled-percent 10 50 --fold 2
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def split(ann_file: str, out_dir: str, percents, folds: int, seed: int = 1):
    with open(ann_file) as f:
        coco = json.load(f)
    images = coco.get("images", [])
    anns_by_img: dict = {}
    for a in coco.get("annotations", []):
        anns_by_img.setdefault(a["image_id"], []).append(a)

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for fold in range(1, folds + 1):
        rng = np.random.default_rng(seed + fold)
        order = rng.permutation(len(images))
        for pct in percents:
            n_lab = int(round(len(images) * pct / 100.0))
            lab_idx = set(order[:n_lab].tolist())
            for name, keep in (("labeled", True), ("unlabeled", False)):
                imgs = [im for i, im in enumerate(images)
                        if (i in lab_idx) == keep]
                ids = {im["id"] for im in imgs}
                sub = {
                    "images": imgs,
                    "annotations": [a for im_id, anns in anns_by_img.items()
                                    if im_id in ids for a in anns]
                    if keep else [],
                    "categories": coco.get("categories", []),
                }
                path = os.path.join(
                    out_dir, f"instances_train.{fold}@{pct:g}"
                    + ("" if keep else "-unlabeled") + ".json")
                with open(path, "w") as f:
                    json.dump(sub, f)
                written.append(path)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ann_file")
    p.add_argument("out_dir")
    p.add_argument("--labeled-percent", nargs="+", type=float,
                   default=[1, 2, 5, 10])
    p.add_argument("--fold", type=int, default=5)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()
    for path in split(args.ann_file, args.out_dir, args.labeled_percent,
                      args.fold, args.seed):
        print(path)


if __name__ == "__main__":
    main()
