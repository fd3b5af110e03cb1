#!/usr/bin/env python
"""IoU benchmark + consistency harness (tests/test_all_ious.py parity).

Reports, per backend: wall time for N pairs, error statistics vs the
unbiased oracle (mean/std/median/max abs error), and Pearson R — the table
the reference README's headline numbers come from (README.md:34-43).

    python tools/benchmark_iou.py --size 1000000 --backends sph2pob_efficient fov sph
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1_000_000)
    p.add_argument("--box-version", type=int, default=4, choices=[4, 5])
    p.add_argument("--backends", nargs="*", default=[
        "sph2pob_efficient", "sph2pob_standard", "sph2pob_legacy",
        "sph", "fov", "naive", "unbiased"])
    p.add_argument("--pallas", action="store_true",
                   help="also benchmark the fused Pallas kernel")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.geometry import generate_boxes
    from sph_retina_tpu.iou import sph_overlaps
    from sph_retina_tpu.ops import sph2pob_iou_aligned_tpu

    n = args.size
    b1 = jnp.asarray(generate_boxes(n, args.box_version, seed=args.seed))
    b2 = jnp.asarray(generate_boxes(n, args.box_version, seed=args.seed + 1))

    def timed(fn):
        # Device-side timing: block_until_ready does not actually block over
        # the remote TPU tunnel and a single call pays ~30 ms of roundtrip
        # latency, so run `iters` perturbed evaluations inside one jitted
        # fori_loop and fetch a scalar.
        out = np.asarray(fn(b1, b2), np.float64)

        @jax.jit
        def loop(a, b):
            def body(i, acc):
                return acc + jnp.sum(fn(a + i.astype(jnp.float32) * 1e-6, b))
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        float(loop(b1, b2))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(b1, b2))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return out, best

    gold, t_gold = timed(jax.jit(
        lambda a, b: sph_overlaps(a, b, "unbiased", is_aligned=True)))
    rows = []
    for backend in args.backends + (["pallas_fused"] if args.pallas else []):
        if backend == "pallas_fused":
            fn = jax.jit(sph2pob_iou_aligned_tpu)
        elif backend == "unbiased":
            rows.append(dict(backend="unbiased", time_s=round(t_gold, 4),
                             mpairs_per_s=round(n / t_gold / 1e6, 1),
                             mean_err=0.0, max_err=0.0, pearson_r=1.0))
            continue
        else:
            fn = jax.jit(lambda a, b, bk=backend: sph_overlaps(
                a, b, bk, is_aligned=True))
        vals, t = timed(fn)
        err = np.abs(vals - gold)
        rows.append(dict(
            backend=backend,
            time_s=round(t, 4),
            mpairs_per_s=round(n / t / 1e6, 1),
            mean_err=round(float(err.mean()), 5),
            median_err=round(float(np.median(err)), 6),
            max_err=round(float(err.max()), 4),
            pearson_r=round(float(np.corrcoef(vals, gold)[0, 1]), 4),
        ))

    print(f"# {n:,} random pairs, box_version={args.box_version}, "
          f"device={jax.devices()[0]}")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
