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
    p.add_argument("--diff-seed", action="store_true",
                   help="per-rank augmentation streams (seed + rank; "
                        "reference tools/train.py --diff-seed). Shuffle, "
                        "init, and the train-step rng stay coordinated — "
                        "params are replicated, so those must match on "
                        "every process.")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use an in-memory synthetic dataset")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (the environment pins the TPU "
                        "plugin; use cpu for smoke tests)")
    p.add_argument("--load-backbone", default=None, metavar="PATH",
                   help="torch checkpoint (.pth state_dict, torchvision "
                        "layout) ported onto the backbone before training — "
                        "torchvision://resnet50 parity")
    p.add_argument("--launcher", default="none", choices=["none", "jax"],
                   help="multi-process init: 'jax' calls "
                        "jax.distributed.initialize (args from "
                        "COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID or "
                        "auto-detected on TPU pods)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for --launcher jax")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import jax

    from sph_retina_tpu.parallel import (
        data_mesh, host_local_copy, init_distributed, make_global_batch,
        replicate_to_mesh,
    )

    rank, world = init_distributed(
        args.launcher, coordinator_address=args.coordinator,
        num_processes=args.num_processes, process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.data import DataLoader, SphPipeline, make_synthetic_dataset
    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step
    from sph_retina_tpu.engine.evaluator import evaluate_dataset
    from sph_retina_tpu.engine.runner import (
        Checkpointer, MetricLogger, RankZeroCheckpointer, run_training,
    )
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.setdefault("seed", args.seed)
    if args.diff_seed:
        cfg["aug_seed"] = args.seed + rank

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)

    if args.synthetic:
        ds = make_synthetic_dataset(
            n_images=cfg.get("data", {}).get("n_synthetic", 32),
            num_classes=cfg["model"]["num_classes"],
            img_size=tuple(cfg.get("img_size", (512, 1024))),
            box_version=cfg["model"].get("box_version", 4))
        pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                           max_gt=cfg.get("data", {}).get("max_gt", 64),
                           box_version=cfg["model"].get("box_version", 4))
        bs = cfg.get("data", {}).get("samples_per_gpu", 4)
        loader = DataLoader(ds, pipe, batch_size=bs, seed=args.seed,
                            aug_seed=cfg.get("aug_seed"),
                            num_shards=world, shard_id=rank)
        val_loader = DataLoader(ds, pipe, batch_size=bs, shuffle=False,
                                drop_last=False, seed=args.seed,
                                num_shards=world, shard_id=rank)
    else:
        ds, loader = build_datasets(cfg, "train", num_shards=world,
                                    shard_id=rank)
        _, val_loader = build_datasets(cfg, "val", num_shards=world,
                                       shard_id=rank)
        # NumClassCheckHook parity (reference
        # mmdet/core/hook/checkloss_hook.py sibling, enabled in
        # configs/..._pandora_old.py:17): a head/dataset class-count
        # mismatch silently corrupts training, so fail fast.
        if ds.num_classes != cfg["model"]["num_classes"]:
            raise ValueError(
                f"model.num_classes={cfg['model']['num_classes']} but the "
                f"dataset {getattr(ds, 'ann_file', '?')} has "
                f"{ds.num_classes} categories")

    max_epochs = args.max_epochs or cfg.get("runner", {}).get("max_epochs", 120)
    tx = build_tx(cfg, steps_per_epoch=max(len(loader), 1),
                  num_processes=jax.process_count())

    rng = jax.random.PRNGKey(args.seed)
    h, w = cfg.get("img_size", (512, 1024))
    sample = jnp.zeros((1, h, w, 3), jnp.float32)
    variables0 = family.init(model, rng, sample)
    if args.load_backbone:
        from sph_retina_tpu.models import load_backbone

        arch = cfg["model"].get("backbone", {}).get("arch") or (
            "vgg16" if cfg["model"].get("type", "").endswith("SSD")
            else f"resnet{cfg['model'].get('backbone', {}).get('depth', 50)}")
        variables0 = load_backbone(variables0, args.load_backbone, arch=arch)
        print(f"loaded {arch} backbone from {args.load_backbone}")
    from sph_retina_tpu.engine.train import TrainState
    state = TrainState(jnp.zeros((), jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))

    ckpt_cls = RankZeroCheckpointer if world > 1 else Checkpointer
    ckpt = ckpt_cls(os.path.join(work_dir, "ckpts"))
    if args.resume_from or args.auto_resume:
        state = ckpt.restore(state, args.resume_from)
        print(f"resumed from step {int(state.step)}")

    mesh = data_mesh()
    state = replicate_to_mesh(state, mesh)
    print(f"process {rank}/{world}; devices: {len(jax.devices())} "
          f"({len(jax.local_devices())} local); steps/epoch: {len(loader)}")
    if rank == 0:
        from sph_retina_tpu.utils.env import env_string

        print(env_string())  # collect_env parity: log the environment

    log_cfg = cfg.get("log_config", {})
    logger = MetricLogger(work_dir, enabled=rank == 0,
                          interval=log_cfg.get("interval", 10),
                          wandb_init=log_cfg.get("wandb", None))

    step = jax.jit(
        make_generic_train_step(family, model, det_cfg, tx, seed=args.seed),
        donate_argnums=0)

    predict = jax.jit(family.predict_fn(model, det_cfg))

    def eval_fn(s):
        variables = {"params": s.params, "batch_stats": s.batch_stats}
        if world > 1:
            # run inference process-locally on this process's val shard,
            # then all-gather results (multi_gpu_test semantics)
            variables = host_local_copy(variables)
        return {k: v for k, v in evaluate_dataset(
            model, det_cfg, variables, val_loader, predict=predict,
            distributed=world > 1).items() if isinstance(v, (int, float))}

    try:
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
                memory_interval=next(
                    (h.get("interval", 50)
                     for h in (cfg.get("custom_hooks") or [])
                     if isinstance(h, dict)
                     and "MemoryProfiler" in str(h.get("type", ""))),
                    cfg.get("memory_interval")),
                shard=lambda b: make_global_batch(
                    {k: v for k, v in b.items() if k != "img_id"}, mesh),
            )
    finally:
        logger.close()
    print("training done")


if __name__ == "__main__":
    main()
