#!/usr/bin/env python
"""Training-log analysis (tools/analysis_tools/analyze_logs.py parity).

Reads the JSONL metric log written by the runner.

    python tools/analyze_logs.py plot_curve work_dirs/run/metrics.jsonl \
        --keys loss loss_cls --out curves.png
    python tools/analyze_logs.py cal_train_time work_dirs/run/metrics.jsonl
"""

from __future__ import annotations

import argparse
import json


def load_log(path):
    records = []
    with open(path) as f:
        for line in f:
            records.append(json.loads(line))
    return records


def plot_curve(records, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for key in keys:
        xs = [r["step"] for r in records if key in r and r["prefix"] == "train"]
        ys = [r[key] for r in records if key in r and r["prefix"] == "train"]
        if not xs:
            xs = [r["step"] for r in records if key in r]
            ys = [r[key] for r in records if key in r]
        ax.plot(xs, ys, label=key)
    ax.set_xlabel("step")
    ax.legend()
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"saved {out}")


def cal_train_time(records):
    times = [r["epoch_time"] for r in records if r.get("prefix") == "epoch"]
    if not times:
        print("no epoch records")
        return
    import numpy as np

    print(f"epochs: {len(times)}  mean: {np.mean(times):.2f}s  "
          f"fastest: {min(times):.2f}s  slowest: {max(times):.2f}s")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["plot_curve", "cal_train_time"])
    p.add_argument("log")
    p.add_argument("--keys", nargs="*", default=["loss"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()
    records = load_log(args.log)
    if args.task == "plot_curve":
        plot_curve(records, args.keys, args.out)
    else:
        cal_train_time(records)
