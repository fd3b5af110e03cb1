#!/usr/bin/env python
"""Train a spherical detector.

Usage parity with the reference CLI (tools/train.py there):

    python tools/train.py configs/sph_retinanet_r50_fpn_120e_indoor360.py \
        --work-dir work_dirs/retina_indoor360 \
        --cfg-options optimizer.lr=0.01 data.samples_per_gpu=8

``--synthetic`` trains on an in-memory synthetic dataset (smoke testing
without data on disk). Data parallelism engages automatically over all
visible devices.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a spherical detector")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use an in-memory synthetic dataset")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (the environment pins the TPU "
                        "plugin; use cpu for smoke tests)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from sph_retina_tpu.data import DataLoader, SphPipeline, make_synthetic_dataset
    from sph_retina_tpu.engine import (
        create_train_state, make_train_step, shard_batch,
    )
    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step
    from sph_retina_tpu.engine.evaluator import evaluate_dataset
    from sph_retina_tpu.engine.runner import Checkpointer, MetricLogger, run_training
    from sph_retina_tpu.engine.train import replicate_state
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.setdefault("seed", args.seed)

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)

    if args.synthetic:
        ds = make_synthetic_dataset(
            n_images=32, num_classes=cfg["model"]["num_classes"],
            img_size=tuple(cfg.get("img_size", (512, 1024))),
            box_version=cfg["model"].get("box_version", 4))
        pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                           max_gt=cfg.get("data", {}).get("max_gt", 64),
                           box_version=cfg["model"].get("box_version", 4))
        bs = cfg.get("data", {}).get("samples_per_gpu", 4)
        loader = DataLoader(ds, pipe, batch_size=bs, seed=args.seed)
        val_loader = DataLoader(ds, pipe, batch_size=bs, shuffle=False,
                                drop_last=False, seed=args.seed)
    else:
        _, loader = build_datasets(cfg, "train")
        _, val_loader = build_datasets(cfg, "val")

    max_epochs = args.max_epochs or cfg.get("runner", {}).get("max_epochs", 120)
    tx = build_tx(cfg, steps_per_epoch=max(len(loader), 1))

    rng = jax.random.PRNGKey(args.seed)
    h, w = cfg.get("img_size", (512, 1024))
    sample = jnp.zeros((1, h, w, 3), jnp.float32)
    variables0 = family.init(model, rng, sample)
    from sph_retina_tpu.engine.train import TrainState
    import jax.numpy as _jnp
    state = TrainState(_jnp.zeros((), _jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))

    devices = np.array(jax.devices())
    mesh = Mesh(devices, axis_names=("data",))
    state = replicate_state(state, mesh)
    print(f"devices: {devices.tolist()}; steps/epoch: {len(loader)}")

    ckpt = Checkpointer(os.path.join(work_dir, "ckpts"))
    if args.resume_from or args.auto_resume:
        state = ckpt.restore(state, args.resume_from)
        print(f"resumed from step {int(state.step)}")

    logger = MetricLogger(work_dir,
                          interval=cfg.get("log_config", {}).get("interval", 10))

    step = jax.jit(make_generic_train_step(family, model, det_cfg, tx),
                   donate_argnums=0)

    predict = jax.jit(family.predict_fn(model, det_cfg))

    def eval_fn(s):
        variables = {"params": s.params, "batch_stats": s.batch_stats}
        return {k: v for k, v in evaluate_dataset(
            model, det_cfg, variables, val_loader, predict=predict).items()
            if isinstance(v, float)}

    with mesh:
        run_training(
            train_step=step,
            state=state,
            loader=loader,
            max_epochs=max_epochs,
            logger=logger,
            checkpointer=ckpt,
            ckpt_interval=(cfg.get("checkpoint_config") or {}).get("interval", 25),
            eval_fn=eval_fn if cfg.get("evaluation") else None,
            eval_interval=(cfg.get("evaluation") or {}).get("interval", 5),
            shard=lambda b: shard_batch(
                {k: v for k, v in b.items() if k != "img_id"}, mesh),
        )
    logger.close()
    print("training done")


if __name__ == "__main__":
    main()
