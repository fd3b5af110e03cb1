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
        from .train import maybe_normalize_images

        cls_scores, bbox_preds = model.apply(
            variables, maybe_normalize_images(images))
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
    distributed: bool = False,
    return_raw: bool = False,
) -> dict:
    """Run inference over a (non-shuffled) loader and compute COCO-style AP.

    ``predict(variables, images) -> NMSResult`` defaults to the RetinaNet
    path; pass a zoo family's jitted predict for other detectors.

    ``distributed=True``: the loader is expected to be process-sharded
    (``DataLoader(num_shards=n_proc, shard_id=rank)``); per-process padded
    result arrays are all-gathered to every process and de-duplicated by
    image id before scoring (reference ``multi_gpu_test`` + collect_results
    semantics, /root/reference/mmdet/apis/test.py:81-213), so every process
    returns the identical full-dataset metrics.
    """
    if predict is None:
        predict = make_predict_step(model, cfg)
    acc = {k: [] for k in ("boxes", "scores", "labels", "valid",
                           "gt_boxes", "gt_labels", "gt_mask",
                           "ig_boxes", "ig_labels", "ig_mask", "img_id")}
    for batch in loader.epoch(0):
        res = predict(variables, jnp.asarray(batch["images"]))
        b = batch["gt_boxes"].shape[0]
        d = batch["gt_boxes"].shape[-1]
        acc["boxes"].append(np.asarray(res.boxes))
        acc["scores"].append(np.asarray(res.scores))
        acc["labels"].append(np.asarray(res.labels))
        acc["valid"].append(np.asarray(res.valid))
        acc["gt_boxes"].append(np.asarray(batch["gt_boxes"]))
        acc["gt_labels"].append(np.asarray(batch["gt_labels"]))
        acc["gt_mask"].append(np.asarray(batch["gt_mask"]))
        # Crowd/ignore regions (COCO iscrowd) — absent from synthetic batches
        acc["ig_boxes"].append(np.asarray(
            batch.get("ig_boxes", np.ones((b, 1, d), np.float32))))
        acc["ig_labels"].append(np.asarray(
            batch.get("ig_labels", np.zeros((b, 1), np.int32))))
        acc["ig_mask"].append(np.asarray(
            batch.get("ig_mask", np.zeros((b, 1), bool))))
        acc["img_id"].append(np.asarray(
            batch.get("img_id", np.full(res.boxes.shape[0], -1, np.int64))))
    arrays = {k: np.concatenate(v, axis=0) for k, v in acc.items()}

    if distributed:
        from ..parallel import all_gather_eval_arrays

        arrays = all_gather_eval_arrays(arrays)
        if np.all(arrays["img_id"] >= 0):
            # drop wrap-pad duplicates from the sharded sampler
            _, first = np.unique(arrays["img_id"], return_index=True)
            keep = np.sort(first)
            arrays = {k: v[keep] for k, v in arrays.items()}

    det_results, annotations = [], []
    for i in range(arrays["boxes"].shape[0]):
        v = arrays["valid"][i]
        det_results.append((arrays["boxes"][i][v], arrays["scores"][i][v],
                            arrays["labels"][i][v]))
        m = arrays["gt_mask"][i]
        im = arrays["ig_mask"][i]
        annotations.append({
            "boxes": arrays["gt_boxes"][i][m],
            "labels": arrays["gt_labels"][i][m],
            "ignore_boxes": arrays["ig_boxes"][i][im],
            "ignore_labels": arrays["ig_labels"][i][im],
        })
    kwargs = {} if iou_thrs is None else {"iou_thrs": iou_thrs}
    metrics = eval_spherical_map(
        det_results, annotations, cfg.num_classes, backend=backend, **kwargs
    )
    # Post-dedup image count: observability for the distributed gather
    # (must equal the dataset size — wrap-pad duplicates removed exactly).
    metrics["n_images"] = int(arrays["boxes"].shape[0])
    if return_raw:
        return metrics, arrays
    return metrics
