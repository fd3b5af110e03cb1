#!/usr/bin/env python
"""Corruption-robustness benchmark (test_robustness.py parity).

Counterpart of /root/reference/tools/analysis_tools/test_robustness.py:
evaluates a checkpoint on the clean set and under image corruptions x
severities (sph_retina_tpu/data/corruptions.py), writing a nested JSON
that tools/robustness_eval.py turns into P / mPC / rPC.

    python tools/test_robustness.py cfg.py ckpts --out robust.json \
        --corruptions gaussian_noise motion_blur --severities 1 3 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--corruptions", nargs="+", default=["benchmark"],
                   help="'benchmark' = every implemented corruption")
    p.add_argument("--severities", nargs="+", type=int, default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--iou-backend", default="sph2pob_efficient")
    p.add_argument("--out", default="robustness_results.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n-images", type=int, default=16,
                   help="synthetic dataset size")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    import jax.numpy as jnp

    from sph_retina_tpu.data import DataLoader, SphPipeline, make_synthetic_dataset
    from sph_retina_tpu.data.corruptions import (
        BENCHMARK_CORRUPTIONS,
        CorruptedDataset,
    )
    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.evaluator import evaluate_dataset
    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    img_size = tuple(cfg.get("img_size", (512, 1024)))
    box_version = cfg["model"].get("box_version", 4)

    if args.synthetic:
        base_ds = make_synthetic_dataset(
            n_images=args.n_images, num_classes=cfg["model"]["num_classes"],
            img_size=img_size, box_version=box_version)
    else:
        base_ds, _ = build_datasets(cfg, "test")
    pipe = SphPipeline(img_size=img_size, training=False,
                       box_version=box_version)

    tx = build_tx(cfg, steps_per_epoch=1)
    h, w = img_size
    variables0 = family.init(model, jax.random.PRNGKey(0),
                             jnp.zeros((1, h, w, 3)))
    state = TrainState(jnp.zeros((), jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))
    state = Checkpointer(args.checkpoint).restore(state)
    print(f"loaded checkpoint at step {int(state.step)}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(family.predict_fn(model, det_cfg))

    names = list(BENCHMARK_CORRUPTIONS) \
        if "benchmark" in args.corruptions else args.corruptions
    results: dict = {}
    for name in names:
        for sev in sorted(set(args.severities)):
            if sev == 0 and "clean" in results:
                continue
            ds = (base_ds if sev == 0 else
                  CorruptedDataset(base_ds, name, sev, seed=args.seed))
            loader = DataLoader(ds, pipe, batch_size=4, shuffle=False,
                                drop_last=False)
            r = evaluate_dataset(model, det_cfg, variables, loader,
                                 backend=args.iou_backend, predict=predict)
            summary = {k: v for k, v in r.items() if isinstance(v, float)}
            key = "clean" if sev == 0 else name
            results.setdefault(key, {})[str(sev)] = summary
            print(f"{key} severity={sev}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in summary.items()))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
