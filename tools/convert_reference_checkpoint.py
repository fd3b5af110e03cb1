#!/usr/bin/env python
"""Convert a reference-trained (mmdet-layout) torch checkpoint to a
published npz consumable by init_detector / tools/test.py.

The reference's training artifacts are torch ``.pth`` files holding
``{"meta": ..., "state_dict": ...}`` (mmcv checkpoint format). This maps
the state dict onto the Flax tree (see
``sph_retina_tpu/models/port_mmdet.py``) and writes the single-file
published checkpoint, hash-suffixed:

    python tools/convert_reference_checkpoint.py ref_epoch_120.pth out.npz \
        --depth 50
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="mmdet .pth checkpoint")
    p.add_argument("out_file", help="output .npz path (hash appended)")
    p.add_argument("--depth", type=int, default=50,
                   help="backbone ResNet depth")
    args = p.parse_args()

    import torch

    from sph_retina_tpu.models.port_mmdet import port_mmdet_retinanet
    from sph_retina_tpu.utils.publish import save_published

    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    meta = ckpt.get("meta", {})
    variables = port_mmdet_retinanet(
        {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()},
        depth=args.depth)
    os.makedirs(os.path.dirname(os.path.abspath(args.out_file)),
                exist_ok=True)
    final = save_published(
        args.out_file, variables["params"], variables["batch_stats"],
        meta={"source": os.path.basename(args.checkpoint),
              "epoch": int(meta.get("epoch", 0)) if isinstance(meta, dict)
              else 0})
    print(f"converted -> {final}")


if __name__ == "__main__":
    main()
