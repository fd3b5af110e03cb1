"""Matplotlib analysis plots (plot_visualizer.py parity: IoU scatter/curves)."""

from __future__ import annotations

import numpy as np


def plot_iou_scatter(iou_a, iou_b, label_a="backend", label_b="unbiased",
                     out_file=None):
    """Scatter of one IoU backend against the oracle (test_iou_scatter)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(np.asarray(iou_b), np.asarray(iou_a), s=2, alpha=0.3)
    ax.plot([0, 1], [0, 1], "r--", lw=1)
    r = np.corrcoef(np.asarray(iou_a), np.asarray(iou_b))[0, 1]
    ax.set_xlabel(label_b)
    ax.set_ylabel(label_a)
    ax.set_title(f"R = {r:.4f}")
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return r


def plot_curve(xs, ys_dict, xlabel="x", ylabel="y", out_file=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for name, ys in ys_dict.items():
        ax.plot(np.asarray(xs), np.asarray(ys), label=name)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend()
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches="tight")
    plt.close(fig)
