#!/usr/bin/env python
"""Convert raw radian annotations to the internal degree format.

Reference tools/convert_anno.py:5-15: raw boxes are (lon in [-pi, pi],
lat in [pi/2, -pi/2]) radians; internal "chenbin" format is theta in
[0, 360), phi in [0, 180) degrees:

    theta = lon * 180/pi + 180
    phi   = 90 - lat * 180/pi

    python tools/convert_anno.py datasets/PANDORA/annotations/train.json
"""

from __future__ import annotations

import argparse
import json
from math import pi


def convert_box(box):
    box[0] = box[0] / pi * 180.0 + 180.0
    box[1] = 90.0 - box[1] / pi * 180.0
    return box


def convert_file(path: str, out: str | None = None):
    with open(path) as f:
        anno = json.load(f)
    for ann in anno.get("annotations", []):
        convert_box(ann["bbox"])
    with open(out or path, "w") as f:
        json.dump(anno, f)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs="+")
    p.add_argument("--out", default=None,
                   help="output path (single input only); default: in place")
    args = p.parse_args()
    for path in args.paths:
        convert_file(path, args.out if len(args.paths) == 1 else None)
        print(f"converted {path}")
