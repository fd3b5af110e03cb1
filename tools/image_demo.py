#!/usr/bin/env python
"""Single-image inference demo (demo/image_demo.py parity).

    python tools/image_demo.py IMG config CKPT_DIR --out vis.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms",
                          "axon" if args.device == "tpu" else args.device)
    import jax.numpy as jnp
    import numpy as np

    from sph_retina_tpu.data import SphPipeline
    from sph_retina_tpu.engine import create_train_state
    from sph_retina_tpu.engine.builder import (
        build_detector_config, build_model, build_tx,
    )
    from sph_retina_tpu.engine.evaluator import make_predict_step
    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.utils.config import apply_overrides, load_config
    from sph_retina_tpu.visualize import draw_boxes

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    det_cfg = build_detector_config(cfg)
    model = build_model(cfg)

    pipe = SphPipeline(img_size=tuple(cfg.get("img_size", (512, 1024))),
                       training=False)
    raw = pipe.load_image(args.img)
    resized = pipe.resize(raw)
    img = pipe.normalize(resized)

    tx = build_tx(cfg, 1)
    h, w = cfg.get("img_size", (512, 1024))
    state = create_train_state(model, det_cfg, jax.random.PRNGKey(0), tx,
                               jnp.zeros((1, h, w, 3)))
    state = Checkpointer(args.checkpoint).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    predict = make_predict_step(model, det_cfg)
    res = predict(variables, jnp.asarray(img)[None])
    v = np.asarray(res.valid[0])
    out = draw_boxes(resized, np.asarray(res.boxes[0])[v],
                     np.asarray(res.labels[0])[v],
                     np.asarray(res.scores[0])[v],
                     score_thr=args.score_thr)
    from PIL import Image

    Image.fromarray(out).save(args.out)
    print(f"saved {args.out} with {int(v.sum())} detections")


if __name__ == "__main__":
    main()
