#!/usr/bin/env python
"""FLOPs / parameter count of a configured detector forward.

Counterpart of /root/reference/tools/analysis_tools/get_flops.py (there:
mmcv flops_counter hooks; here: XLA's own compiled-HLO cost analysis, which
counts what actually runs after fusion, plus an exact parameter tally).

    python tools/get_flops.py configs/sph_retinanet_r50_fpn_120e_indoor360.py \
        --shape 512 1024 --device cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _fmt(n: float, unit: str) -> str:
    for scale, suffix in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "K")):
        if n >= scale:
            return f"{n / scale:.2f} {suffix}{unit}"
    return f"{n:.0f} {unit}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=None,
                   metavar=("H", "W"), help="input size (default: cfg img_size)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)

    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    if args.shape:
        cfg["img_size"] = tuple(args.shape)
    h, w = cfg.get("img_size", (512, 1024))

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    images = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    variables = family.init(model, jax.random.PRNGKey(0), images)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables["params"]))

    def forward(images):
        return model.apply(variables, images)

    compiled = jax.jit(forward).lower(images).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # one entry per executable module
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    bytes_acc = float(cost.get("bytes accessed", float("nan")))

    print(f"config:     {os.path.basename(args.config)}")
    print(f"input:      ({args.batch}, {h}, {w}, 3)")
    print(f"params:     {_fmt(n_params, '')} ({n_params})")
    print(f"flops:      {_fmt(flops, 'FLOPs')} (post-fusion HLO, fwd)")
    print(f"hbm bytes:  {_fmt(bytes_acc, 'B')}")


if __name__ == "__main__":
    main()
