"""High-level programmatic inference API.

Parity with the reference's ``mmdet/apis/inference.py``:

- ``init_detector``       (/root/reference/mmdet/apis/inference.py:18)
- ``inference_detector``  (/root/reference/mmdet/apis/inference.py:99)
- ``show_result``         (/root/reference/mmdet/apis/inference.py:222 +
                           sphdet/visualizers/sph_draw.py:438)

The reference returns results as a per-image list of ``num_classes`` numpy
arrays of shape (n_i, box_version + 1) (boxes + score) — the format every
mmdet analysis tool consumes. ``inference_detector`` reproduces that format
so downstream code written against the reference ports directly.

TPU-first notes: the predict function is jitted once per (detector,
batch-shape) and reused across calls; images are batched before the single
device dispatch instead of the reference's one-forward-per-image loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["Detector", "init_detector", "inference_detector", "show_result"]


@dataclass
class Detector:
    """Bundle returned by :func:`init_detector`.

    The reference attaches ``cfg`` onto the torch module; here the bundle is
    explicit (functional model + variables + jitted predict)."""

    model: Any
    cfg: dict
    det_cfg: Any
    variables: dict
    predict: Callable
    pipeline: Any
    num_classes: int
    box_version: int


def init_detector(config, checkpoint: str | None = None,
                  cfg_options: Sequence[str] | None = None,
                  seed: int = 0) -> Detector:
    """Build a detector from a config (path or dict) + optional checkpoint.

    ``checkpoint=None`` keeps the random initialization (reference behavior:
    "Use the config the model, NOT the checkpoint" warning path,
    mmdet/apis/inference.py:44-52).
    """
    import jax
    import jax.numpy as jnp

    from .data import SphPipeline
    from .engine.builder import build_tx
    from .engine.runner import Checkpointer
    from .engine.train import TrainState
    from .engine.zoo import get_family
    from .utils.config import apply_overrides, load_config

    cfg = dict(config) if isinstance(config, dict) else load_config(config)
    if cfg_options:
        cfg = apply_overrides(cfg, list(cfg_options))

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    h, w = cfg.get("img_size", (512, 1024))
    variables = family.init(model, jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 3)))
    if checkpoint and checkpoint.endswith(".npz"):
        # published single-file checkpoint (tools/publish_model.py)
        from .utils.publish import load_published

        params, batch_stats, _ = load_published(checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}
    elif checkpoint:
        tx = build_tx(cfg, steps_per_epoch=1)
        state = TrainState(jnp.zeros((), jnp.int32), variables["params"],
                           variables.get("batch_stats", {}),
                           tx.init(variables["params"]))
        state = Checkpointer(checkpoint).restore(state)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    else:
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}

    bv = cfg["model"].get("box_version", 4)
    pipeline = SphPipeline(img_size=(h, w), training=False, box_version=bv)
    predict = jax.jit(family.predict_fn(model, det_cfg))
    return Detector(model=model, cfg=cfg, det_cfg=det_cfg,
                    variables=variables, predict=predict, pipeline=pipeline,
                    num_classes=cfg["model"]["num_classes"], box_version=bv)


def _prepare(det: Detector, img) -> tuple[np.ndarray, np.ndarray]:
    """-> (raw resized uint8 HxWx3 for drawing, normalized float input)."""
    if isinstance(img, str):
        img = det.pipeline.load_image(img)
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.dtype != np.uint8:
        # float arrays are 0-255 scale (reference convention: images stay
        # 0-255 until Normalize); PIL's fromarray rejects float RGB, so
        # coerce before the resize path.
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    resized = det.pipeline.resize(img)
    return resized, det.pipeline.normalize(resized)


def inference_detector(det: Detector, imgs):
    """Run inference on one image or a list of images.

    ``imgs``: file path, HxWx3 uint8/float array, or a list of either.
    Returns (for each image) a list of ``num_classes`` float32 arrays of
    shape (n_i, box_version + 1) — spherical degrees + score, the reference
    result format (mmdet/apis/inference.py:99-141, results unwrapped for a
    single input exactly like the reference's ``is_batch`` handling).
    """
    import jax.numpy as jnp

    is_batch = isinstance(imgs, (list, tuple))
    img_list = list(imgs) if is_batch else [imgs]

    prepared = [_prepare(det, im) for im in img_list]
    batch = jnp.asarray(np.stack([p[1] for p in prepared]))
    res = det.predict(det.variables, batch)

    boxes = np.asarray(res.boxes, np.float32)
    scores = np.asarray(res.scores, np.float32)
    labels = np.asarray(res.labels)
    valid = np.asarray(res.valid)

    results = []
    for i in range(len(img_list)):
        per_class = []
        for c in range(det.num_classes):
            sel = valid[i] & (labels[i] == c)
            per_class.append(
                np.concatenate([boxes[i][sel], scores[i][sel, None]],
                               axis=1))
        results.append(per_class)
    return results if is_batch else results[0]


def show_result(det: Detector, img, result, score_thr: float = 0.3,
                out_file: str | None = None) -> np.ndarray:
    """Draw a result (per-class list from :func:`inference_detector`) on the
    image; returns the rendered uint8 array and optionally saves it."""
    from .visualize import draw_boxes

    raw, _ = _prepare(det, img)
    boxes, labels, scores = [], [], []
    for c, dets in enumerate(result):
        for row in dets:
            boxes.append(row[:-1])
            scores.append(row[-1])
            labels.append(c)
    if boxes:
        boxes = np.stack(boxes)
        labels = np.asarray(labels)
        scores = np.asarray(scores)
    else:
        boxes = np.zeros((0, det.box_version), np.float32)
        labels = np.zeros((0,), np.int64)
        scores = np.zeros((0,), np.float32)
    out = draw_boxes(raw, boxes, labels, scores, score_thr=score_thr)
    if out_file:
        from PIL import Image

        Image.fromarray(out).save(out_file)
    return out
