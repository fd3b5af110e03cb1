#!/usr/bin/env python
"""Visualize Kent distributions on the ERP chart.

Counterpart of the reference's root ``vis_kent_samples.py`` (3-D scatter of
approximate Kent samples). Here: exact density heatmap on the ERP lat-long
grid, optional tangent-Gaussian samples, optional ERP background image, and
BFoV input via the framework's ``deg2kent`` moment estimator.

    # from a spherical box (theta phi alpha beta, degrees)
    python tools/vis_kent.py --bfov 120 60 40 30 --samples 500 --out kent.png

    # from raw canonical params (kappa beta alpha psi eta)
    python tools/vis_kent.py --kent 20 5 1.0 0.3 0.5 --out kent.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--bfov", type=float, nargs=4, metavar=("THETA", "PHI",
                   "ALPHA", "BETA"),
                   help="spherical box in degrees; converted with deg2kent")
    p.add_argument("--kent", type=float, nargs=5,
                   metavar=("KAPPA", "BETA", "ALPHA", "PSI", "ETA"),
                   help="canonical Kent parameters (angles in radians)")
    p.add_argument("--mle", action="store_true",
                   help="use the Newton MLE instead of moment estimation "
                        "for --bfov")
    p.add_argument("--img-size", type=int, nargs=2, default=(256, 512),
                   metavar=("H", "W"))
    p.add_argument("--samples", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image", default=None, help="ERP background image")
    p.add_argument("--out", default="kent_density.png")
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu", "axon"],
                   help="backend for deg2kent/kent_mle (default cpu: a "
                        "host-side raster must not wedge on the TPU tunnel)")
    args = p.parse_args()

    if (args.bfov is None) == (args.kent is None):
        p.error("pass exactly one of --bfov / --kent")

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import numpy as np

    from sph_retina_tpu.visualize.kent_vis import plot_kent_density

    if args.kent is not None:
        params = np.asarray(args.kent, np.float64)
        title = None
    else:
        from sph_retina_tpu.iou import deg2kent, kent_mle

        box = np.asarray(args.bfov, np.float64)[None]
        est = kent_mle if args.mle else deg2kent
        params = np.asarray(est(box))[0]
        title = ("BFoV ({:g}, {:g}, {:g}, {:g}) -> Kent kappa={:.3g} "
                 "beta={:.3g}".format(*box[0], params[0], params[1]))

    image = None
    if args.image:
        from PIL import Image

        image = np.asarray(Image.open(args.image).convert("RGB"))

    plot_kent_density(params, tuple(args.img_size), samples=args.samples,
                      seed=args.seed, image=image, out_file=args.out,
                      title=title)
    print(f"kappa={params[0]:.4g} beta={params[1]:.4g} -> {args.out}")


if __name__ == "__main__":
    main()
