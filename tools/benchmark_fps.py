#!/usr/bin/env python
"""Inference FPS benchmark (tools/analysis_tools/benchmark.py parity:
2000 iterations, 5 warmup, device-synchronized timing).

    python tools/benchmark_fps.py configs/sph_retinanet_r50_fpn_120e_indoor360.py \
        --batch-size 8 --max-iter 200
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
    p.add_argument("config")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--with-nms", action="store_true",
                   help="include decode+NMS postprocessing")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)
    import jax.numpy as jnp

    from sph_retina_tpu.engine import create_train_state
    from sph_retina_tpu.engine.builder import (
        build_detector_config, build_model, build_tx,
    )
    from sph_retina_tpu.engine.evaluator import make_predict_step
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    det_cfg = build_detector_config(cfg)
    model = build_model(cfg)
    h, w = cfg.get("img_size", (512, 1024))
    b = args.batch_size
    images = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3))
    tx = build_tx(cfg, 1)
    state = create_train_state(model, det_cfg, jax.random.PRNGKey(0), tx,
                               images[:1])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.with_nms:
        fn = make_predict_step(model, det_cfg)
        run = lambda: fn(variables, images)
    else:
        apply = jax.jit(model.apply)
        run = lambda: apply(variables, images)

    for _ in range(args.warmup):
        jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(args.max_iter):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.max_iter
    print(json.dumps({
        "img_per_s": round(b / dt, 2),
        "ms_per_batch": round(dt * 1e3, 2),
        "batch_size": b,
        "img_size": [h, w],
        "with_nms": bool(args.with_nms),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
