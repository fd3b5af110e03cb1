#!/usr/bin/env python
"""Per-class error-type decomposition plots (C75/C50/Loc/Oth/BG/FN).

Counterpart of /root/reference/tools/analysis_tools/coco_error_analysis.py:
stacked precision/recall areas showing how much AP each error source costs,
with all matching done by spherical IoU
(sph_retina_tpu/engine/error_analysis.py).

    python tools/test.py cfg.py ckpts --save-raw raw.npz
    python tools/coco_error_analysis.py cfg.py raw.npz out_dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference color ramp (coco_error_analysis.py:14-21), one per band
COLORS = [(0.31, 0.51, 0.74), (0.75, 0.31, 0.30), (0.36, 0.90, 0.38),
          (0.50, 0.39, 0.64), (1.0, 0.6, 0.0), (0.8, 0.8, 0.8)]


def make_plot(ps_cls, ap_cls, title, out_file):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from sph_retina_tpu.engine.error_analysis import (
        ERROR_TYPES,
        RECALL_LEVELS,
    )

    fig, ax = plt.subplots(figsize=(6, 5))
    prev = np.zeros_like(RECALL_LEVELS)
    for k, name in enumerate(ERROR_TYPES):
        cur = ps_cls[k]
        ax.plot(RECALL_LEVELS, cur, color="k", linewidth=0.5)
        ax.fill_between(RECALL_LEVELS, prev, cur, color=COLORS[k],
                        label=f"[{ap_cls[k]:.3f}] {name}")
        prev = cur
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title(title)
    ax.legend(loc="lower left", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_file, dpi=150)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("raw_results", help="npz from tools/test.py --save-raw")
    p.add_argument("out_dir")
    p.add_argument("--backend", default="unbiased")
    p.add_argument("--max-dets", type=int, default=100)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from sph_retina_tpu.engine.analysis import _unpack, load_raw_results
    from sph_retina_tpu.engine.error_analysis import (
        ERROR_TYPES,
        error_decomposition,
    )
    from sph_retina_tpu.utils.config import load_config

    cfg = load_config(args.config)
    num_classes = cfg["model"]["num_classes"]
    arrays = load_raw_results(args.raw_results)

    dets, anns = [], []
    for i in range(arrays["boxes"].shape[0]):
        det_boxes, scores, det_labels, gt_boxes, gt_labels = _unpack(arrays, i)
        dets.append((det_boxes, scores, det_labels))
        anns.append({"boxes": gt_boxes, "labels": gt_labels})

    out = error_decomposition(dets, anns, num_classes,
                              backend=args.backend, max_dets=args.max_dets)
    os.makedirs(args.out_dir, exist_ok=True)

    names = cfg.get("classes") or [f"class_{c}" for c in range(num_classes)]
    for c in np.where(out["valid"])[0]:
        make_plot(out["ps"][:, :, c], out["ap"][:, c],
                  f"bbox-{names[c]}-allarea",
                  os.path.join(args.out_dir, f"bbox-{names[c]}-allarea.png"))
    mean_ps = out["ps"][:, :, out["valid"]].mean(axis=2)
    mean_ap = out["ap"][:, out["valid"]].mean(axis=1)
    make_plot(mean_ps, mean_ap, "bbox-allclass-allarea",
              os.path.join(args.out_dir, "bbox-allclass-allarea.png"))

    summary = {name: float(v) for name, v in zip(ERROR_TYPES, mean_ap)}
    with open(os.path.join(args.out_dir, "error_analysis.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("mean AP per error rung:",
          " ".join(f"{k}={v:.3f}" for k, v in summary.items()))
    print(f"wrote {int(out['valid'].sum()) + 1} plots to {args.out_dir}")


if __name__ == "__main__":
    main()
