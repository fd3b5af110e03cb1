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


def report_breakdown(cfg, tx, batch, rng):
    """Device-steady per-stage timing of the RetinaNet train step.

    Stages are timed as standalone jitted programs on real intermediate
    tensors (backbone -> neck -> head -> loss), each via the marginal-rate
    method (``(t_long - t_short) / (n_long - n_short)`` around a device-side
    ``fori_loop``) — the only honest timing over the axon tunnel, where
    ``block_until_ready`` does not block. The full fwd+bwd+update step is
    timed the same way; ``backward+update`` is reported as the residual
    (full - sum of forward stages - loss). Standalone-stage times slightly
    overstate the fused in-situ cost (XLA fuses across stage boundaries
    inside the real step), so the table is an attribution, not a sum of
    independent parts.
    """
    import time

    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.train import (
        TrainState, create_train_state, make_train_step,
    )
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.models.fpn import FPN
    from sph_retina_tpu.models.heads.retina_head import SphRetinaHead
    from sph_retina_tpu.models.resnet import ResNet
    from sph_retina_tpu.models.single_stage import retina_loss

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    if type(model).__name__ != "SphRetinaNet":
        raise SystemExit("--breakdown supports SphRetinaNet configs")
    state = create_train_state(model, det_cfg, rng, tx, batch["images"][:1])
    params, bstats = state.params, state.batch_stats

    def timed_ms(fn, tree, n_short=3, n_long=18):
        """Marginal ms/call of ``fn(tree)`` inside a device-side loop."""

        def perturb(t, i):
            return jax.tree_util.tree_map(
                lambda v: v + i.astype(v.dtype) * jnp.asarray(1e-6, v.dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, t)

        @jax.jit
        def loop(t, n):
            def body(i, acc):
                out = fn(perturb(t, i))
                return acc + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                    out, jnp.float32(0.0))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(tree, 1))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter(); float(loop(tree, n_short))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(tree, n_long))
            tl = time.perf_counter() - t0
            best = min(best, (tl - ts) / (n_long - n_short))
        return best * 1e3

    images = batch["images"]
    mdl_kw = cfg.get("model", {}).get("backbone", {})
    backbone = ResNet(depth=mdl_kw.get("depth", 50), out_indices=(0, 1, 2, 3),
                      dtype=model.dtype, groups=model.groups,
                      base_width=model.base_width)
    neck = FPN(out_channels=model.feat_channels, start_level=1, num_outs=5,
               add_extra_convs="on_input", dtype=model.dtype)
    head = SphRetinaHead(num_classes=model.num_classes,
                         box_version=model.box_version,
                         feat_channels=model.feat_channels,
                         num_base_priors=model.num_base_priors,
                         dtype=model.dtype)

    bb_vars = {"params": params["backbone"],
               "batch_stats": bstats.get("backbone", {})}
    feats = jax.jit(lambda x: backbone.apply(bb_vars, x))(images)
    neck_feats = jax.jit(lambda f: neck.apply(
        {"params": params["neck"]}, f))(feats)
    head_out = jax.jit(lambda f: head.apply(
        {"params": params["bbox_head"]}, f))(neck_feats)
    anchors = det_cfg.flat_anchors()

    rows = [
        ("backbone fwd (R%d)" % mdl_kw.get("depth", 50),
         timed_ms(lambda x: backbone.apply(bb_vars, x), images)),
        ("neck fwd (FPN)",
         timed_ms(lambda f: neck.apply({"params": params["neck"]}, f),
                  feats)),
        ("head fwd (cls+reg towers)",
         timed_ms(lambda f: head.apply({"params": params["bbox_head"]}, f),
                  neck_feats)),
        ("loss (assign IoU + coder + focal + sph2pob)",
         timed_ms(lambda o: sum(retina_loss(
             det_cfg, o[0], o[1], anchors, batch["gt_boxes"],
             batch["gt_labels"], batch["gt_mask"]).values()), head_out)),
    ]
    step = make_train_step(model, det_cfg, tx, retina_loss)

    # Full-step timing must thread the updated TrainState through the loop
    # — discarding it lets XLA dead-code-eliminate the entire backward +
    # update (measured: the "full" step collapses to forward+loss cost).
    @jax.jit
    def loop_full(st, n):
        def body(i, carry):
            s0, acc = carry
            imgs = batch["images"] + i.astype(model.dtype) * 1e-6
            s2, met = step(s0, dict(batch, images=imgs))
            return s2, acc + met["loss"]
        return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))[1]

    float(loop_full(state, 1))
    full = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(loop_full(state, 3))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop_full(state, 18))
        tl = time.perf_counter() - t0
        full = min(full, (tl - ts) / 15 * 1e3)
    fwd_loss = sum(ms for _, ms in rows)
    rows.append(("backward + SGD update (residual)",
                 max(full - fwd_loss, 0.0)))
    b = images.shape[0]
    print(f"train-step breakdown  batch={b}  {images.shape[1]}x"
          f"{images.shape[2]}  platform={jax.devices()[0].platform}")
    for name, ms in rows:
        print(f"  {name:<44s} {ms:8.2f} ms  {100 * ms / full:5.1f}%")
    print(f"  {'FULL train step (fwd+bwd+update)':<44s} {full:8.2f} ms  "
          f"-> {1e3 * b / full:.1f} img/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--logdir", default="/tmp/jax_trace")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument("--breakdown", action="store_true",
                   help="print a per-stage device-steady timing table of the "
                        "train step (backbone/neck/head/loss/backward) "
                        "instead of tracing")
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
    if args.breakdown:
        return report_breakdown(cfg, tx, batch, rng)

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
