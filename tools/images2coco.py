#!/usr/bin/env python
"""Build an (unannotated) COCO-style JSON from a directory of ERP images.

Counterpart of /root/reference/tools/dataset_converters/images2coco.py:
lists images, records their sizes, and writes a COCO JSON with the given
classes and an empty annotation list — the input format for inference /
test-time runs over raw image collections.

    python tools/images2coco.py img_dir classes.txt out.json
"""

from __future__ import annotations

import argparse
import json
import os

EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img_dir")
    p.add_argument("classes", help="text file, one class name per line")
    p.add_argument("out", help="output annotation json filename")
    p.add_argument("--exclude-extensions", nargs="*", default=[])
    args = p.parse_args()

    from PIL import Image

    with open(args.classes) as f:
        classes = [l.strip() for l in f if l.strip()]
    excluded = tuple(e if e.startswith(".") else "." + e
                     for e in args.exclude_extensions)

    images = []
    files = sorted(os.listdir(args.img_dir))
    for i, name in enumerate(files):
        ext = os.path.splitext(name)[1].lower()
        if ext not in EXTS or (excluded and ext in excluded):
            continue
        with Image.open(os.path.join(args.img_dir, name)) as im:
            w, h = im.size
        images.append({"id": len(images), "file_name": name,
                       "width": w, "height": h})

    coco = {
        "images": images,
        "annotations": [],
        "categories": [{"id": i + 1, "name": c}
                       for i, c in enumerate(classes)],
    }
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    print(f"{len(images)} images -> {args.out}")


if __name__ == "__main__":
    main()
