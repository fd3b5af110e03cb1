#!/usr/bin/env python
"""Assemble a GIF from the galleries written by tools/analyze_results.py.

Counterpart of /root/reference/demo/create_result_gif.py (pages through the
result images saved by analyze_results and writes an animated GIF via
imageio).

    python tools/create_result_gif.py out_dir --out result.gif
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description="Create GIF from result images")
    p.add_argument("image_dir",
                   help="directory written by tools/analyze_results.py "
                        "(searched recursively for png/jpg)")
    p.add_argument("--out", default="result.gif")
    p.add_argument("--duration", type=float, default=2.0,
                   help="seconds per frame")
    p.add_argument("--ncols", type=int, default=1,
                   help="tile this many images per frame")
    args = p.parse_args()

    import imageio
    import numpy as np
    from PIL import Image

    paths = []
    for root, _, files in os.walk(args.image_dir):
        for f in sorted(files):
            if f.lower().endswith((".png", ".jpg", ".jpeg")):
                paths.append(os.path.join(root, f))
    if not paths:
        raise SystemExit(f"no images under {args.image_dir}")

    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    h = min(im.shape[0] for im in imgs)
    w = min(im.shape[1] for im in imgs)
    imgs = [np.asarray(Image.fromarray(im).resize((w, h))) for im in imgs]

    frames = []
    for i in range(0, len(imgs), args.ncols):
        tile = imgs[i:i + args.ncols]
        while len(tile) < args.ncols:  # pad the last frame row
            tile.append(np.zeros_like(tile[0]))
        frames.append(np.concatenate(tile, axis=1))
    imageio.mimsave(args.out, frames, format="GIF",
                    duration=args.duration * 1000.0, loop=0)
    print(f"{len(frames)} frames -> {args.out}")


if __name__ == "__main__":
    main()
