#!/usr/bin/env python
"""Render dataset images with their GT spherical boxes drawn.

Counterpart of /root/reference/tools/analysis_tools/browse_dataset.py:
walks the configured dataset through the pipeline and writes each image
with its ground-truth boxes rasterized (slerp great-circle borders) so
annotations and augmentations can be eyeballed.

    python tools/browse_dataset.py cfg.py --out-dir browsed --max-images 20
    python tools/browse_dataset.py cfg.py --split val --no-pipeline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--out-dir", default="browsed_dataset")
    p.add_argument("--max-images", type=int, default=50)
    p.add_argument("--no-pipeline", action="store_true",
                   help="draw on the raw image instead of the piped one")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np

    from sph_retina_tpu.data import SphCocoDataset, SphPipeline
    from sph_retina_tpu.utils.config import load_config
    from sph_retina_tpu.visualize import draw_boxes

    cfg = load_config(args.config)
    d = cfg["data"][args.split]
    box_version = cfg["model"].get("box_version", 4)
    ds = SphCocoDataset(ann_file=d["ann_file"],
                        img_prefix=d.get("img_prefix", ""),
                        box_version=box_version)
    pipe = SphPipeline(
        img_size=tuple(cfg.get("img_size", (512, 1024))),
        flip_ratio=cfg["data"].get("flip_ratio", 0.5)
        if args.split == "train" else 0.0,
        max_gt=cfg["data"].get("max_gt", 64),
        box_version=box_version,
        training=args.split == "train",
    )
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    names = ds.classes or None

    n = min(len(ds), args.max_images)
    for i in range(n):
        item = ds[i]
        if args.no_pipeline:
            img = pipe.load_image(item["img_path"]).astype(np.uint8)
            boxes, labels = item["boxes"], item["labels"]
        else:
            out = pipe(item, rng)
            # un-normalize back to displayable pixels
            img = np.clip(out["images"] * pipe.std + pipe.mean, 0, 255)
            m = out["gt_mask"].astype(bool)
            boxes, labels = out["gt_boxes"][m], out["gt_labels"][m]
        vis = draw_boxes(img, boxes, labels=labels, class_names=names)
        from PIL import Image

        name = os.path.splitext(os.path.basename(item["file_name"]))[0]
        Image.fromarray(vis).save(os.path.join(args.out_dir, f"{name}.png"))
    print(f"wrote {n} images to {args.out_dir}/")


if __name__ == "__main__":
    main()
