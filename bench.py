"""North-star benchmark: fused spherical box-pair IoU throughput on one chip.

Reproduces the reference's headline workload — IoU of 1,000,000 random
spherical box pairs, uniform theta in (0,360), phi in (0,180), fov in (1,100)
deg (/root/reference/tests/test_all_ious.py:141-147, README.md:43) — through
the fused Pallas sph2pob+rotated-IoU kernel, timed device-side (fori_loop
with input perturbation so iterations cannot be CSE'd).

Baseline: reference CUDA pipeline (sph2pob transform + mmcv box_iou_rotated)
does 1M pairs in 0.0096 s = 104.2 M pairs/s (/root/reference/README.md:38).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from sph_retina_tpu.geometry import generate_boxes
from sph_retina_tpu.ops import sph2pob_iou_aligned_tpu

N = 1_000_000
ITERS = 20
BASELINE_MPAIRS_S = 104.2  # reference CUDA, 1M pairs / 0.0096 s


def main():
    b1 = jnp.asarray(generate_boxes(N, 4, seed=1))
    b2 = jnp.asarray(generate_boxes(N, 4, seed=2))

    @jax.jit
    def loop(x, y):
        def body(i, acc):
            xx = x + i.astype(jnp.float32) * 1e-6
            return acc + jnp.sum(sph2pob_iou_aligned_tpu(xx, y))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    loop(b1, b2).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(b1, b2))
        best = min(best, (time.perf_counter() - t0) / ITERS)

    mpairs = N / best / 1e6
    print(json.dumps({
        "metric": "sph2pob_iou_pairs_per_sec",
        "value": round(mpairs * 1e6),
        "unit": "pairs/s",
        "vs_baseline": round(mpairs / BASELINE_MPAIRS_S, 2),
    }))


if __name__ == "__main__":
    main()
