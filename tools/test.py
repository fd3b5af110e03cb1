#!/usr/bin/env python
"""Evaluate a trained spherical detector checkpoint (tools/test.py parity).

    python tools/test.py <config> <checkpoint_dir> --eval bbox
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
    p.add_argument("--eval", default="bbox")
    p.add_argument("--iou-backend", default="sph2pob_efficient",
                   help="spherical IoU backend used for det-gt matching")
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--save-raw", default=None, metavar="NPZ",
                   help="write padded raw result arrays (input to "
                        "tools/confusion_matrix.py / analyze_results.py)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="evaluate with EMA shadow weights (EMAHook parity); "
                        "requires a checkpoint trained with ema_momentum")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (the environment pins the TPU "
                        "plugin; use cpu for smoke tests)")
    p.add_argument("--launcher", default="none", choices=["none", "jax"],
                   help="multi-process eval: shard the dataset over "
                        "processes and all-gather results")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    from sph_retina_tpu.parallel import init_distributed

    rank, world = init_distributed(args.launcher)

    import jax.numpy as jnp

    from sph_retina_tpu.data import DataLoader, SphPipeline, make_synthetic_dataset
    from sph_retina_tpu.engine import create_train_state
    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.engine.evaluator import evaluate_dataset
    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    family = get_family(cfg)
    model, det_cfg = family.build(cfg)

    if args.synthetic:
        ds = make_synthetic_dataset(
            n_images=16, num_classes=cfg["model"]["num_classes"],
            img_size=tuple(cfg.get("img_size", (512, 1024))),
            box_version=cfg["model"].get("box_version", 4))
        pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                           training=False,
                           box_version=cfg["model"].get("box_version", 4))
        loader = DataLoader(ds, pipe, batch_size=4, shuffle=False,
                            drop_last=False, num_shards=world, shard_id=rank)
    else:
        _, loader = build_datasets(cfg, "test", num_shards=world,
                                   shard_id=rank)

    tx = build_tx(cfg, steps_per_epoch=1)
    h, w = cfg.get("img_size", (512, 1024))
    variables0 = family.init(model, jax.random.PRNGKey(0),
                             jnp.zeros((1, h, w, 3)))
    from sph_retina_tpu.engine.train import TrainState
    state = TrainState(jnp.zeros((), jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))
    ckpt = Checkpointer(args.checkpoint)
    state = ckpt.restore(state)
    print(f"loaded checkpoint at step {int(state.step)}")
    if args.ema:
        from sph_retina_tpu.engine.train import get_ema_params, with_ema_params

        if get_ema_params(state.opt_state) is None:
            raise SystemExit("--ema: checkpoint has no EMA state "
                             "(train with ema_momentum / EMAHook)")
        state = with_ema_params(state)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(family.predict_fn(model, det_cfg))
    results = evaluate_dataset(model, det_cfg, variables, loader,
                               backend=args.iou_backend, predict=predict,
                               distributed=world > 1,
                               return_raw=bool(args.save_raw))
    if args.save_raw:
        results, raw = results
        if rank == 0:
            from sph_retina_tpu.engine.analysis import save_raw_results

            save_raw_results(args.save_raw, raw)
            print(f"raw results -> {args.save_raw}")
    summary = {k: v for k, v in results.items() if isinstance(v, float)}
    if rank == 0:
        print(json.dumps(summary, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(summary, f)


if __name__ == "__main__":
    main()
