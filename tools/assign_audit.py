#!/usr/bin/env python
"""Assignment-quality audit: measure what supervision each IoU backend
actually produces (VERDICT r4 item 1).

The round-4 AP study found orderings that contradict the reference paper's
ablation table (/root/reference/README.md:36-45): crude ``sph`` assignment
beat the flagship ``sph2pob`` by ~8 AP50 on sphere-bench and ``fov``
collapsed to 0.14. Kernel-level parity with the reference's own torch
modules is already proven by differential fuzz, so any real discrepancy
must live in assignment-time integration. This tool turns the hypotheses
into measurements, on sphere-bench GT against the *real* anchor grid of the
study config, through the *real* training assignment path
(``models/single_stage._batch_pairwise_iou`` + ``MaxIoUAssigner`` — the
Pallas kernel on TPU for sph2pob, exactly what training runs):

- **positives-per-GT**: anchors assigned positive per GT (and the pure
  >=pos_thr count, excluding the low-quality argmax rescue) — assignment
  *density*;
- **oracle IoU of selected positives**: the unbiased-IoU of each anchor a
  backend marks positive — assignment *quality* (histogram + mean +
  fraction geometrically below the 0.5/0.4/0.3 lines);
- **flip confusion vs unbiased assignment**: 3x3 pos/neg/ignore category
  counts of each backend's assignment against the assignment the exact
  oracle would have produced, plus same-GT agreement among shared
  positives;
- **threshold-band calibration**: signed backend-minus-oracle IoU error
  restricted to (valid-GT, anchor) pairs whose oracle IoU lies in the
  assigner's decision band [0.3, 0.7], and crossing rates at the 0.4/0.5
  thresholds (the tail that flips labels).

Usage:
    python tools/assign_audit.py --out work_dirs/assign_audit
    python tools/assign_audit.py --quick --out /tmp/audit   # CI smoke

Emits ``audit.json`` and a markdown table ``ASSIGN_AUDIT.md``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

DEFAULT_BACKENDS = ("sph2pob_efficient", "sph2pob_efficient_jnp", "sph",
                    "fov")
ORACLE = "unbiased"
BAND = (0.3, 0.7)
HIST_EDGES = np.linspace(0.0, 1.0, 21)


def load_gt(ann_file, max_gt=None, stratum=None):
    """(boxes (I, G, 4) deg padded, mask (I, G) bool) from a COCO-sph json.

    ``stratum``: keep only images tagged with it ('polar'/'seam'), or only
    untagged images for 'body' (sphere-bench strata tags)."""
    with open(ann_file) as f:
        coco = json.load(f)
    keep = set()
    for im in coco["images"]:
        tags = im.get("strata", ())
        if (stratum is None or (stratum == "body" and not tags)
                or (stratum in tags)):
            keep.add(im["id"])
    per_img = {im["id"]: [] for im in coco["images"] if im["id"] in keep}
    for a in coco["annotations"]:
        if not a.get("iscrowd", 0) and a["image_id"] in per_img:
            per_img[a["image_id"]].append(a["bbox"][:4])
    gmax = max_gt or max(len(v) for v in per_img.values())
    n = len(per_img)
    boxes = np.zeros((n, gmax, 4), np.float32)
    mask = np.zeros((n, gmax), bool)
    for i, (_, bs) in enumerate(sorted(per_img.items())):
        bs = bs[:gmax]
        if bs:
            boxes[i, : len(bs)] = np.asarray(bs, np.float32)
            mask[i, : len(bs)] = True
    return boxes, mask


def pairwise(gt, anchors, backend):
    """(B, G, 4) x (N, 4) -> (B, G, N) through the real training path."""
    from sph_retina_tpu.models.single_stage import _batch_pairwise_iou

    if backend == "sph2pob_efficient_jnp":
        # force the jnp composite even on TPU, so Pallas-vs-composite
        # differences surface on the real anchor distribution
        import jax.numpy as jnp

        from sph_retina_tpu.iou.api import sph_overlaps

        b, g, d = gt.shape
        iou = sph_overlaps(gt.reshape(b * g, d), anchors,
                           "sph2pob_efficient")
        return iou.reshape(b, g, anchors.shape[0])
    return _batch_pairwise_iou(gt, anchors, backend)


def make_audit_step(assigner, anchors, backend):
    import jax
    import jax.numpy as jnp

    pos_thr = assigner.pos_iou_thr
    neg_thr = (assigner.neg_iou_thr if not isinstance(assigner.neg_iou_thr,
                                                      tuple)
               else assigner.neg_iou_thr[1])

    def category(gt_inds):
        # 0 = ignore, 1 = background, 2 = positive
        return jnp.where(gt_inds > 0, 2, jnp.where(gt_inds == 0, 1, 0))

    @jax.jit
    def step(gt_boxes, gt_mask, img_valid):
        ov = pairwise(gt_boxes, anchors, backend)
        ov_o = pairwise(gt_boxes, anchors, ORACLE)
        res = jax.vmap(lambda o, m: assigner(o, m))(ov, gt_mask)
        res_o = jax.vmap(lambda o, m: assigner(o, m))(ov_o, gt_mask)
        b, g, n = ov.shape
        w_img = img_valid.astype(jnp.float32)           # (B,)
        gt_w = gt_mask.astype(jnp.float32) * w_img[:, None]

        pos = res.gt_inds > 0                            # (B, N)
        posf = pos.astype(jnp.float32) * w_img[:, None]

        # positives per GT: assigned, and pure >= pos_thr count
        eq = (res.gt_inds[:, None, :]
              == (jnp.arange(g) + 1)[None, :, None])     # (B, G, N)
        pos_per_gt = jnp.sum(eq.astype(jnp.float32), -1) * gt_w   # (B, G)
        thr_per_gt = jnp.sum((ov >= pos_thr).astype(jnp.float32), -1) * gt_w

        # oracle IoU of the anchors this backend selected as positives
        safe = jnp.clip(res.gt_inds - 1, 0, g - 1)       # (B, N)
        oval = jnp.take_along_axis(ov_o, safe[:, None, :], axis=1)[:, 0, :]
        bins = jnp.clip((oval * 20).astype(jnp.int32), 0, 19)
        hist = jnp.sum(
            jax.nn.one_hot(bins, 20) * posf[..., None], axis=(0, 1))
        pos_cnt = jnp.sum(posf)
        pos_oracle_sum = jnp.sum(oval * posf)
        below = {t: jnp.sum((oval < t) * posf) for t in (0.3, 0.4, 0.5)}

        # flip confusion vs the oracle assignment (3x3)
        cat = category(res.gt_inds)
        cat_o = category(res_o.gt_inds)
        conf = jnp.sum(
            (jax.nn.one_hot(cat, 3)[..., :, None]
             * jax.nn.one_hot(cat_o, 3)[..., None, :])
            * w_img[:, None, None, None], axis=(0, 1))   # (3, 3) bk x oracle
        both_pos = pos & (res_o.gt_inds > 0)
        same_gt = jnp.sum((both_pos & (res.gt_inds == res_o.gt_inds))
                          .astype(jnp.float32) * w_img[:, None])
        both_cnt = jnp.sum(both_pos.astype(jnp.float32) * w_img[:, None])

        # threshold-band calibration on valid (gt, anchor) pairs
        pair_w = gt_w[..., None]                          # (B, G, 1)
        band = ((ov_o >= BAND[0]) & (ov_o <= BAND[1])).astype(jnp.float32) \
            * pair_w
        err = ov - ov_o
        band_cnt = jnp.sum(band)
        band_err_sum = jnp.sum(err * band)
        band_abs_sum = jnp.sum(jnp.abs(err) * band)
        crossings = {}
        for t in (neg_thr, pos_thr):
            promo = ((ov >= t) & (ov_o < t)).astype(jnp.float32) * band
            demo = ((ov < t) & (ov_o >= t)).astype(jnp.float32) * band
            crossings[f"promote_{t}"] = jnp.sum(promo)
            crossings[f"demote_{t}"] = jnp.sum(demo)

        return dict(
            pos_per_gt_sum=jnp.sum(pos_per_gt), gt_cnt=jnp.sum(gt_w),
            pos_per_gt_hist=jnp.sum(
                jax.nn.one_hot(jnp.clip(pos_per_gt, 0, 63).astype(jnp.int32),
                               64) * gt_w[..., None], axis=(0, 1)),
            thr_per_gt_sum=jnp.sum(thr_per_gt),
            thr_zero_gts=jnp.sum((thr_per_gt == 0).astype(jnp.float32)
                                 * gt_w),
            pos_cnt=pos_cnt, pos_oracle_sum=pos_oracle_sum,
            pos_oracle_hist=hist,
            pos_below=below, conf=conf, same_gt=same_gt, both_cnt=both_cnt,
            band_cnt=band_cnt, band_err_sum=band_err_sum,
            band_abs_sum=band_abs_sum, crossings=crossings,
            n_images=jnp.sum(w_img),
        )

    return step


def audit_backend(backend, boxes, mask, assigner, anchors, batch=8):
    import jax

    step = make_audit_step(assigner, anchors, backend)
    n = boxes.shape[0]
    acc = None
    for s in range(0, n, batch):
        gb = boxes[s:s + batch]
        gm = mask[s:s + batch]
        valid = np.ones((gb.shape[0],), bool)
        if gb.shape[0] < batch:     # pad the tail batch, mask padded images
            pad = batch - gb.shape[0]
            gb = np.concatenate([gb, np.zeros((pad,) + gb.shape[1:],
                                              gb.dtype)])
            gm = np.concatenate([gm, np.zeros((pad,) + gm.shape[1:], bool)])
            valid = np.concatenate([valid, np.zeros((pad,), bool)])
        out = step(gb, gm, valid)
        out = jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        acc = out if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, out)
    return summarize(acc)


def summarize(a):
    gt_cnt = max(float(a["gt_cnt"]), 1.0)
    pos_cnt = max(float(a["pos_cnt"]), 1.0)
    both = max(float(a["both_cnt"]), 1.0)
    band = max(float(a["band_cnt"]), 1.0)
    conf = a["conf"]  # rows: backend {ignore, neg, pos}; cols: oracle
    total_anchors = max(float(conf.sum()), 1.0)
    hist = a["pos_oracle_hist"]
    # quantiles of the oracle-IoU-of-positives histogram
    cum = np.cumsum(hist) / max(hist.sum(), 1.0)
    q = {p: round(float(HIST_EDGES[1:][np.searchsorted(cum, p)]), 3)
         for p in (0.1, 0.5, 0.9)}
    ppg_hist = a["pos_per_gt_hist"]
    ppg_cum = np.cumsum(ppg_hist) / max(ppg_hist.sum(), 1.0)
    ppg_q = {p: int(np.searchsorted(ppg_cum, p)) for p in (0.1, 0.5, 0.9)}
    return {
        "n_images": int(a["n_images"]),
        "n_gts": int(a["gt_cnt"]),
        "pos_per_gt_mean": round(float(a["pos_per_gt_sum"]) / gt_cnt, 2),
        "pos_per_gt_p10_p50_p90": [ppg_q[0.1], ppg_q[0.5], ppg_q[0.9]],
        "thr_pos_per_gt_mean": round(float(a["thr_per_gt_sum"]) / gt_cnt, 2),
        "gt_frac_zero_thr_pos": round(float(a["thr_zero_gts"]) / gt_cnt, 4),
        "pos_total": int(a["pos_cnt"]),
        "pos_oracle_iou_mean": round(float(a["pos_oracle_sum"]) / pos_cnt, 4),
        "pos_oracle_iou_p10_p50_p90": [q[0.1], q[0.5], q[0.9]],
        "pos_frac_oracle_below": {
            str(t): round(float(a["pos_below"][t]) / pos_cnt, 4)
            for t in (0.3, 0.4, 0.5)},
        "flip_confusion_vs_unbiased": {
            "backend_rows_oracle_cols_ignore_neg_pos":
                [[int(x) for x in row] for row in conf],
            "anchor_category_flip_rate": round(
                float(total_anchors - np.trace(conf)) / total_anchors, 6),
            "pos_agree_same_gt_frac": round(float(a["same_gt"]) / both, 4),
            "false_pos_anchors": int(conf[2, 0] + conf[2, 1]),
            "missed_pos_anchors": int(conf[0, 2] + conf[1, 2]),
        },
        "band_calibration_oracle_0.3_0.7": {
            "n_pairs": int(a["band_cnt"]),
            "signed_err_mean": round(float(a["band_err_sum"]) / band, 4),
            "abs_err_mean": round(float(a["band_abs_sum"]) / band, 4),
            "crossings": {k: int(v) for k, v in a["crossings"].items()},
        },
    }


def write_markdown(report, path):
    b = report["backends"]
    lines = [
        "# Assignment-quality audit (sphere-bench GT x real anchor grid)",
        "",
        f"Config `{report['config']}`, split `{report['split']}`, "
        f"{report['n_images']} images, {report['n_gts']} GTs, "
        f"{report['n_anchors']} anchors; oracle = unbiased IoU; assigner "
        f"pos/neg thresholds {report['pos_iou_thr']}/{report['neg_iou_thr']}.",
        "",
        "| backend | pos/GT | >=thr pos/GT | oracle IoU of pos (mean) "
        "| pos with oracle<0.4 | cat flip rate | same-GT agree "
        "| band signed err |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, s in b.items():
        f = s["flip_confusion_vs_unbiased"]
        c = s["band_calibration_oracle_0.3_0.7"]
        lines.append(
            f"| {name} | {s['pos_per_gt_mean']} | {s['thr_pos_per_gt_mean']}"
            f" | {s['pos_oracle_iou_mean']} "
            f"| {s['pos_frac_oracle_below']['0.4']:.3f} "
            f"| {f['anchor_category_flip_rate']:.4f} "
            f"| {f['pos_agree_same_gt_frac']:.3f} "
            f"| {c['signed_err_mean']:+.4f} |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def run_audit(*, data_root, out_dir, config, split="train",
              backends=DEFAULT_BACKENDS, batch=8, device=None,
              max_images=None, extra_overrides=(), stratum=None):
    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(device)
    from sph_retina_tpu.engine.zoo import get_family
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    ann = os.path.join(data_root, "annotations",
                       f"instances_{split}.json")
    with open(ann) as f:
        ncls = len(json.load(f)["categories"])
    cfg = apply_overrides(load_config(config),
                          [f"model.num_classes={ncls}",
                           *extra_overrides])
    _, det_cfg = get_family(cfg).build(cfg)
    anchors = np.asarray(det_cfg.flat_anchors())
    boxes, mask = load_gt(ann, stratum=stratum)
    if max_images:
        boxes, mask = boxes[:max_images], mask[:max_images]

    report = {
        "config": os.path.relpath(config),
        "split": split,
        "stratum": stratum,
        "n_images": int(boxes.shape[0]),
        "n_gts": int(mask.sum()),
        "n_anchors": int(anchors.shape[0]),
        "pos_iou_thr": det_cfg.assigner.pos_iou_thr,
        "neg_iou_thr": det_cfg.assigner.neg_iou_thr,
        "oracle": ORACLE,
        "backends": {},
    }
    for bk in backends:
        print(f"=== auditing backend {bk}")
        report["backends"][bk] = audit_backend(
            bk, boxes, mask, det_cfg.assigner, anchors, batch=batch)
        s = report["backends"][bk]
        flip = s["flip_confusion_vs_unbiased"]["anchor_category_flip_rate"]
        print(f"    pos/GT={s['pos_per_gt_mean']} "
              f"oracleIoU(pos)={s['pos_oracle_iou_mean']} flip={flip}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "audit.json"), "w") as f:
        json.dump(report, f, indent=1)
    write_markdown(report, os.path.join(out_dir, "ASSIGN_AUDIT.md"))
    print(f"wrote {out_dir}/audit.json")
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data-root", default="work_dirs/sphere_bench")
    p.add_argument("--out", default="work_dirs/assign_audit")
    p.add_argument("--config",
                   default="configs/sph_retinanet_r18_fpn_24e_spherebench.py")
    p.add_argument("--split", default="train")
    p.add_argument("--backends", nargs="*", default=list(DEFAULT_BACKENDS))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--stratum", default=None,
                   choices=["polar", "seam", "body"],
                   help="restrict to images carrying this sphere-bench "
                        "stratum tag ('body' = untagged images)")
    p.add_argument("--quick", action="store_true",
                   help="first 16 images only (CI smoke)")
    args = p.parse_args()
    run_audit(data_root=args.data_root, out_dir=args.out, config=args.config,
              split=args.split, backends=tuple(args.backends),
              batch=args.batch, device=args.device, stratum=args.stratum,
              max_images=16 if args.quick else args.max_images)


if __name__ == "__main__":
    main()
