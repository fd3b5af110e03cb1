"""Dataset evaluation driver: run the detector over a loader, compute mAP."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.single_stage import DetectorConfig, retina_predict
from .eval import eval_spherical_map


def make_predict_step(model, cfg: DetectorConfig):
    level_anchors = cfg.anchor_generator.grid_anchors(cfg.featmap_sizes())

    @jax.jit
    def predict(variables, images):
        cls_scores, bbox_preds = model.apply(variables, images)
        return retina_predict(cfg, cls_scores, bbox_preds, level_anchors)

    return predict


def evaluate_dataset(
    model,
    cfg: DetectorConfig,
    variables,
    loader,
    *,
    backend: str = "sph2pob_efficient",
    iou_thrs=None,
    predict=None,
) -> dict:
    """Run inference over a (non-shuffled) loader and compute COCO-style AP.

    ``predict(variables, images) -> NMSResult`` defaults to the RetinaNet
    path; pass a zoo family's jitted predict for other detectors."""
    if predict is None:
        predict = make_predict_step(model, cfg)
    det_results, annotations = [], []
    for batch in loader.epoch(0):
        res = predict(variables, jnp.asarray(batch["images"]))
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        labels = np.asarray(res.labels)
        valid = np.asarray(res.valid)
        for i in range(boxes.shape[0]):
            v = valid[i]
            det_results.append((boxes[i][v], scores[i][v], labels[i][v]))
            m = batch["gt_mask"][i]
            annotations.append({
                "boxes": batch["gt_boxes"][i][m],
                "labels": batch["gt_labels"][i][m],
            })
    kwargs = {} if iou_thrs is None else {"iou_thrs": iou_thrs}
    return eval_spherical_map(
        det_results, annotations, cfg.num_classes, backend=backend, **kwargs
    )
