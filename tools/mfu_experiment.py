#!/usr/bin/env python
"""MFU levers experiment (VERDICT r4 item 7).

The published round-4 breakdown (BASELINE.md) puts the RetinaNet-R50 train
step at MFU 0.55 with backward+update = 26.4 ms of the 46.7 ms step, and
attributes the remaining gap to conv-kernel efficiency rather than
framework overhead. This tool tests that attribution with concrete levers:
each experiment recompiles the full train step in a fresh child process
under a different XLA flag set (XLA_FLAGS must be set before backend
init, hence the child) and measures the device-steady marginal step time
plus XLA-cost-analysis MFU.

    python tools/mfu_experiment.py --out work_dirs/mfu_experiments.json

Negative results are recorded too (the round-3 Pallas RoIAlign precedent).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# name -> per-compile XLA compiler options (jax Lowered.compile options).
# XLA_FLAGS cannot carry TPU flags here: the local jaxlib's flag parser
# (CPU build) fatals on unknown --xla_tpu_* flags before the axon plugin
# ever sees them — measured and recorded in round 5; compiler_options go
# through PJRT to the device compiler instead.
EXPERIMENTS = {
    "baseline": None,
    # overlap-aware scheduler: hides copy/elementwise latency behind MXU work
    "latency_hiding_scheduler":
        {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # larger scoped vmem lets the fusion emitter keep bigger conv tiles
    # resident
    "scoped_vmem_128k": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "scoped_vmem_64k": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
}

V5E_PEAK_BF16_FLOPS = 197e12


def child(batch=8, h=512, w=1024, max_gt=16, compiler_options=None):
    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine import create_train_state, make_train_step
    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.geometry import generate_boxes
    from sph_retina_tpu.models.single_stage import retina_loss
    from sph_retina_tpu.utils.config import load_config

    file_cfg = load_config("configs/_base_/sph_retinanet_r50_fpn.py")
    nc = file_cfg["model"]["num_classes"]
    model, cfg = get_family(file_cfg).build(file_cfg)
    tx = build_tx(file_cfg, 100)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, h, w, 3), jnp.float32)
    boxes = jnp.stack([jnp.asarray(generate_boxes(max_gt, 4, seed=i))
                       for i in range(batch)])
    train_batch = {
        "images": images,
        "gt_boxes": boxes,
        "gt_labels": jnp.tile(jnp.arange(max_gt) % nc, (batch, 1)),
        "gt_mask": jnp.tile(jnp.arange(max_gt) < max_gt // 2, (batch, 1)),
    }
    state = create_train_state(model, cfg, rng, tx, images[:1])
    step = jax.jit(make_train_step(model, cfg, tx, retina_loss))

    def many_fn(st, n):
        def body(i, carry):
            s0, acc = carry
            s2, met = step(s0, train_batch)
            return s2, acc + met["loss"]
        return jax.lax.fori_loop(0, n, body, (st, 0.0))[1]

    # compile with per-experiment compiler options (PJRT passes them to
    # the device compiler; XLA_FLAGS cannot — see EXPERIMENTS note)
    lowered = jax.jit(many_fn, static_argnums=1).lower(state, 12)
    compiled = lowered.compile(compiler_options) if compiler_options \
        else lowered.compile()
    lowered2 = jax.jit(many_fn, static_argnums=1).lower(state, 2)
    compiled2 = lowered2.compile(compiler_options) if compiler_options \
        else lowered2.compile()

    float(compiled2(state))  # warm

    def timed(n):
        fn = compiled if n == 12 else compiled2
        t0 = time.perf_counter()
        float(fn(state))
        return time.perf_counter() - t0

    # median-of-positive marginals (bench.py methodology)
    ests = []
    tries = 0
    while len(ests) < 3 and tries < 9:
        tries += 1
        ts, tl = timed(2), timed(12)
        est = (tl - ts) / 10
        if est > 0:
            ests.append(est)
    ests.sort()
    per_step = ests[len(ests) // 2]

    out = {"step_ms": round(per_step * 1e3, 2),
           "imgs_per_sec": round(batch / per_step, 1)}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / 12.0
        if flops > 0:
            out["mfu"] = round(flops / per_step / V5E_PEAK_BF16_FLOPS, 3)
    except Exception:
        pass
    print("CHILD_RESULT " + json.dumps(out))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", default="work_dirs/mfu_experiments.json")
    p.add_argument("--experiments", nargs="*", default=list(EXPERIMENTS))
    p.add_argument("--timeout", type=float, default=900)
    args = p.parse_args()

    results = {}
    for name in args.experiments:
        opts = EXPERIMENTS[name]
        env = dict(os.environ)
        # fresh compile per experiment: the persistent compilation cache
        # would otherwise hand every option set the baseline's executable
        env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
        env["MFU_EXP_OPTIONS"] = json.dumps(opts) if opts else ""
        print(f"=== {name}: compiler_options={opts}", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                timeout=args.timeout, env=env,
                cwd=os.path.join(os.path.dirname(__file__), ".."))
            line = next((l for l in proc.stdout.decode().splitlines()[::-1]
                         if l.startswith("CHILD_RESULT ")), None)
            if proc.returncode == 0 and line:
                results[name] = json.loads(line[len("CHILD_RESULT "):])
            else:
                tail = proc.stdout.decode().splitlines()[-3:]
                results[name] = {"error": f"rc={proc.returncode}: "
                                 + " | ".join(tail)[:300]}
        except subprocess.TimeoutExpired:
            results[name] = {"error": f"timeout {args.timeout}s"}
        print(f"    {results[name]}", flush=True)

    if "baseline" in results and "step_ms" in results.get("baseline", {}):
        base = results["baseline"]["step_ms"]
        for name, r in results.items():
            if "step_ms" in r:
                r["delta_vs_baseline_pct"] = round(
                    100.0 * (r["step_ms"] - base) / base, 2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        raw = os.environ.get("MFU_EXP_OPTIONS", "")
        child(compiler_options=json.loads(raw) if raw else None)
    else:
        main()
