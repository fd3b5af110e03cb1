#!/usr/bin/env python
"""Strip a training checkpoint for publication.

Counterpart of /root/reference/tools/model_converters/publish_model.py:
drops the optimizer state, writes a single compressed npz of
params + batch_stats, and suffixes the filename with the content hash.

    python tools/publish_model.py cfg.py work/ckpts out/model.npz [--ema]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint directory")
    p.add_argument("out_file", help="output .npz path (hash gets appended)")
    p.add_argument("--ema", action="store_true",
                   help="publish the EMA shadow weights instead")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    args = p.parse_args()

    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(args.device)

    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import load_config
    from sph_retina_tpu.utils.publish import save_published

    cfg = load_config(args.config)
    family = get_family(cfg)
    model, _ = family.build(cfg)
    h, w = cfg.get("img_size", (512, 1024))
    variables = family.init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, h, w, 3)))
    tx = build_tx(cfg, steps_per_epoch=1)
    state = TrainState(jnp.zeros((), jnp.int32), variables["params"],
                       variables.get("batch_stats", {}),
                       tx.init(variables["params"]))
    state = Checkpointer(args.checkpoint).restore(state)
    if args.ema:
        from sph_retina_tpu.engine.train import get_ema_params, with_ema_params

        if get_ema_params(state.opt_state) is None:
            raise SystemExit("--ema: checkpoint has no EMA state")
        state = with_ema_params(state)

    os.makedirs(os.path.dirname(os.path.abspath(args.out_file)), exist_ok=True)
    final = save_published(
        args.out_file, state.params, state.batch_stats,
        meta={"step": int(state.step), "config": os.path.basename(args.config),
              "ema": bool(args.ema)})
    print(f"published -> {final}")


if __name__ == "__main__":
    main()
