#!/usr/bin/env python
"""Collect image metadata (file name, width, height) for a dataset.

Counterpart of /root/reference/tools/misc/get_image_metas.py (there:
threaded size collection into a pkl to skip decode-for-shape in
pipelines): reads the annotation file's image list or scans a directory,
verifies sizes against the actual files, and writes a JSON metas file.

    python tools/get_image_metas.py --ann-file ann.json --img-prefix imgs/ --out metas.json
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor


def _size(path):
    from PIL import Image

    with Image.open(path) as im:
        return im.size


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", default=None)
    p.add_argument("--img-dir", default=None)
    p.add_argument("--img-prefix", default="")
    p.add_argument("--out", default="image_metas.json")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    if args.ann_file:
        with open(args.ann_file) as f:
            files = [im["file_name"] for im in json.load(f).get("images", [])]
        prefix = args.img_prefix
    elif args.img_dir:
        files = sorted(f for f in os.listdir(args.img_dir)
                       if os.path.splitext(f)[1].lower()
                       in (".jpg", ".jpeg", ".png", ".bmp", ".webp"))
        prefix = args.img_dir
    else:
        raise SystemExit("need --ann-file or --img-dir")

    with ThreadPoolExecutor(args.workers) as ex:
        sizes = list(ex.map(_size,
                            (os.path.join(prefix, f) for f in files)))
    metas = [{"file_name": f, "width": w, "height": h}
             for f, (w, h) in zip(files, sizes)]
    with open(args.out, "w") as f:
        json.dump(metas, f)
    print(f"{len(metas)} metas -> {args.out}")


if __name__ == "__main__":
    main()
