#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step (aux-subsystem parity with
the reference's ad-hoc line_profiler/autograd-profiler hooks, SURVEY.md §5).

    python tools/profile_step.py configs/sph_retinanet_r50_fpn_120e_indoor360.py \
        --logdir /tmp/jax_trace --steps 5
View with TensorBoard's profile plugin or xprof.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def report_memory(cfg, tx, batch, rng):
    """Compile (don't run) the train step with backbone remat off vs on and
    print XLA's buffer assignment for each: ``temp_size`` is the
    activation/workspace HBM the executable reserves, i.e. the number
    gradient checkpointing exists to shrink. Compiling for the real TPU
    target gives the allocation the runtime would actually make
    (``device.memory_stats()`` is unavailable over the axon tunnel, and
    CPU-backend temp sizes are not comparable).
    """
    import copy

    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step

    rows = []
    for remat in (False, True):
        c = copy.deepcopy(cfg)
        c["model"].setdefault("backbone", {})["remat"] = remat
        family = get_family(c)
        model, det_cfg = family.build(c)
        variables = family.init(model, rng, batch["images"][:1])
        state = TrainState(jnp.zeros((), jnp.int32), variables["params"],
                           variables.get("batch_stats", {}),
                           tx.init(variables["params"]))
        step = jax.jit(make_generic_train_step(family, model, det_cfg, tx),
                       donate_argnums=0)
        mem = step.lower(state, batch).compile().memory_analysis()
        if mem is None:
            print("memory_analysis unavailable on this backend")
            return
        rows.append((remat, mem))
        print(f"remat={remat}: temp={mem.temp_size_in_bytes/2**20:.1f} MiB  "
              f"args={mem.argument_size_in_bytes/2**20:.1f} MiB  "
              f"out={mem.output_size_in_bytes/2**20:.1f} MiB  "
              f"(aliased {mem.alias_size_in_bytes/2**20:.1f} MiB)")
    base, ckpt = rows[0][1], rows[1][1]
    saved = (base.temp_size_in_bytes - ckpt.temp_size_in_bytes) / 2**20
    pct = 100.0 * saved / max(base.temp_size_in_bytes / 2**20, 1e-9)
    print(f"remat saves {saved:.1f} MiB of temp HBM ({pct:.1f}%) "
          f"at batch {batch['images'].shape[0]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--logdir", default="/tmp/jax_trace")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument("--memory", action="store_true",
                   help="instead of tracing, print the compiled train step's "
                        "XLA buffer assignment (argument/output/temp bytes) "
                        "with backbone remat off vs on — quantifies the HBM "
                        "saved by gradient checkpointing on the compile "
                        "target (device memory_stats is unavailable over "
                        "the axon tunnel)")
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step
    from sph_retina_tpu.geometry import generate_boxes
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    tx = build_tx(cfg, 100)

    h, w = cfg.get("img_size", (512, 1024))
    b = args.batch_size
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, h, w, 3))
    g = 16
    batch = {
        "images": images,
        "gt_boxes": jnp.stack([
            jnp.asarray(generate_boxes(g, cfg["model"].get("box_version", 4),
                                       seed=i)) for i in range(b)]),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_mask": jnp.ones((b, g), bool),
    }
    if args.memory:
        return report_memory(cfg, tx, batch, rng)

    variables = family.init(model, rng, images[:1])
    state = TrainState(jnp.zeros((), jnp.int32), variables["params"],
                       variables.get("batch_stats", {}),
                       tx.init(variables["params"]))
    step = jax.jit(make_generic_train_step(family, model, det_cfg, tx),
                   donate_argnums=0)
    state, m = step(state, batch)  # compile outside the trace
    jax.block_until_ready(m)

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, m = step(state, batch)
        jax.block_until_ready(m)
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
