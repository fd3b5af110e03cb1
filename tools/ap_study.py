#!/usr/bin/env python
"""Directional AP-parity study on the sphere-bench synthetic benchmark.

The reference paper's headline ablations (/root/reference/README.md:36-45,
57-58) establish two orderings on 360-Indoor:

1. **loss axis** — Sph2Pob-CIoU beats the L1 baseline
   (AP 11.5/25.7/8.2 vs 10.4/24.5/6.9 on RetinaNet);
2. **assignment axis** — training with sph2pob-based assignment beats the
   approximate sph/fov IoU assignment (the paper's core claim: unbiased
   geometry in the training loop, README.md:36-45 consistency table).

Real 360-Indoor/PANDORA data cannot be fetched here (zero egress), so this
study reproduces the *directions* on sphere-bench (tools/synth_dataset.py)
— a controlled ERP dataset whose object footprints are rasterized with the
exact great-circle inside test the unbiased evaluation IoU uses, with
stratified pole/seam content where spherical-aware geometry matters most.

Each variant trains the tracked config
configs/sph_retinanet_r18_fpn_24e_spherebench.py with dotted overrides
(recorded verbatim in the report), same seed and budget, then evaluates
COCO AP on the val split with **unbiased-oracle matching**, overall and
stratified by image tags (polar / seam / body).

CLI:
    python tools/ap_study.py --out work_dirs/ap_study            # full study
    python tools/ap_study.py --quick --out /tmp/ap_quick         # CI smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

# (name, dotted cfg overrides) — applied to the tracked base config.
# `ciou` IS the base config; listed with empty overrides for the record.
VARIANTS = [
    ("l1", [
        "model.reg_decoded_bbox=False",
        "model.loss_bbox={'type': 'SphL1Loss', 'loss_weight': 1.0}",
    ]),
    ("ciou", []),
    ("assign_sph", [
        "train_cfg.assigner.backend=sph",
    ]),
    ("assign_fov", [
        "train_cfg.assigner.backend=fov",
    ]),
    # Control arm (VERDICT r4 item 1): the exact unbiased oracle AS the
    # training assigner. Decides whether any approximate backend's AP
    # delta comes from its assignment geometry (then unbiased should sit
    # at the top-quality end) or from benchmark/training noise (then all
    # assignment arms land inside the seed-noise band).
    ("assign_unbiased", [
        "train_cfg.assigner.backend=unbiased",
    ]),
    # Full Kent pipeline (the fork's kent_retinanet config: KLD-IoU
    # assignment + Kent KLD loss on decoded boxes) — the fork itself never
    # published Kent AP numbers; this variant demonstrates the path trains
    # end to end on a benchmark.
    # Kent KLD magnitudes are much larger than IoU losses and the fork
    # pairs them with tiny batches (samples_per_gpu=1); at this study's
    # B=8 the base lr diverges, so the variant runs at lr/4 with a small
    # loss weight.
    ("kent", [
        "model.loss_bbox={'type': 'KentLoss', 'loss_weight': 0.1}",
        "train_cfg.assigner.backend=kent",
        "optimizer.lr=0.0025",
    ]),
]

# Detector-family axis (reference README.md:53-60: every family improves
# L1 -> Sph2Pob-CIoU). Each family gets its own tracked spherebench base
# config whose default IS the ciou variant; `l1` reverts to the family's
# stock delta/L1 regression. The assignment axis is studied on the
# retinanet family only (same as the reference's ablation table).
FAMILY_CONFIGS = {
    "retinanet": "sph_retinanet_r18_fpn_24e_spherebench.py",
    "fcos": "sph_fcos_r18_fpn_24e_spherebench.py",
    "ssd": "sph_ssd_24e_spherebench.py",
    "faster_rcnn": "sph_faster_rcnn_r18_fpn_24e_spherebench.py",
    # RBFoV (box_version=5): run with --box-version 5 and a separate
    # --data-root/--out so the rotated dataset/report live alongside the
    # BFoV ones.
    "rbfov": "sph_rotated_retinanet_r18_24e_spherebench.py",
}
FAMILY_VARIANTS = {
    "retinanet": VARIANTS,
    # FCOS has no delta parameterization; its L1 baseline regresses decoded
    # box coordinates (degrees). Smooth-L1 + reduced lr: plain L1 on
    # exp-decoded distances diverges (unbounded early boxes).
    "fcos": [
        ("l1", [
            "model.loss_bbox={'type': 'SmoothL1Loss', 'beta': 5.0, "
            "'loss_weight': 0.05}",
            "optimizer.lr=0.005",
        ]),
        ("ciou", []),
    ],
    "ssd": [
        ("l1", ["model.reg_decoded_bbox=False"]),
        ("ciou", []),
    ],
    "faster_rcnn": [
        ("l1", ["model.reg_decoded_bbox=False"]),
        ("ciou", []),
    ],
    "rbfov": [
        ("l1", [
            "model.reg_decoded_bbox=False",
            "model.loss_bbox={'type': 'SphL1Loss', 'loss_weight': 1.0}",
        ]),
        ("ciou", []),
    ],
}

STRATA = ("polar", "seam", "body")


def _arrays_to_lists(arrays, idx):
    """Per-image (dets, annotations) lists from evaluator raw arrays."""
    det_results, annotations = [], []
    for i in idx:
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
    return det_results, annotations


def stratified_metrics(arrays, strata_by_img, num_classes,
                       backend="unbiased"):
    """AP per image stratum. An image counts toward every tag it carries;
    untagged images form the 'body' stratum."""
    from sph_retina_tpu.engine.eval import eval_spherical_map

    img_ids = arrays["img_id"]
    out = {}
    for stratum in STRATA:
        if stratum == "body":
            keep = [i for i, g in enumerate(img_ids)
                    if not strata_by_img.get(int(g))]
        else:
            keep = [i for i, g in enumerate(img_ids)
                    if stratum in strata_by_img.get(int(g), ())]
        if not keep:
            continue
        dets, anns = _arrays_to_lists(arrays, keep)
        m = eval_spherical_map(dets, anns, num_classes, backend=backend)
        out[stratum] = {"AP50": m["AP50"], "mAP": m["mAP"],
                        "n_images": len(keep)}
    return out


def train_variant(cfg, *, seed, work_dir, max_epochs=None):
    """Single-process train-to-completion; returns (state, family bundle)."""
    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.builder import build_datasets, build_tx
    from sph_retina_tpu.engine.runner import MetricLogger, run_training
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step
    from sph_retina_tpu.parallel import (
        data_mesh, make_global_batch, replicate_to_mesh,
    )

    family = get_family(cfg)
    model, det_cfg = family.build(cfg)
    ds, loader = build_datasets(cfg, "train")
    if ds.num_classes != cfg["model"]["num_classes"]:
        raise ValueError(f"dataset has {ds.num_classes} classes, config "
                         f"says {cfg['model']['num_classes']}")
    max_epochs = max_epochs or cfg.get("runner", {}).get("max_epochs", 24)
    tx = build_tx(cfg, steps_per_epoch=max(len(loader), 1))

    rng = jax.random.PRNGKey(seed)
    h, w = cfg.get("img_size", (256, 512))
    # jit the init: eager init is hundreds of small ops, each a host->device
    # round-trip over the tunnel (minutes per variant); one compiled program
    # brings it to seconds.
    variables0 = jax.jit(lambda r, x: family.init(model, r, x))(
        rng, jnp.zeros((1, h, w, 3), jnp.float32))
    state = TrainState(jnp.zeros((), jnp.int32), variables0["params"],
                       variables0.get("batch_stats", {}),
                       tx.init(variables0["params"]))

    mesh = data_mesh()
    state = replicate_to_mesh(state, mesh)
    step = jax.jit(
        make_generic_train_step(family, model, det_cfg, tx, seed=seed),
        donate_argnums=0)
    logger = MetricLogger(work_dir, enabled=True,
                          interval=cfg.get("log_config", {}).get("interval", 20))
    t0 = time.time()
    try:
        with mesh:
            state = run_training(
                train_step=step, state=state, loader=loader,
                max_epochs=max_epochs, logger=logger,
                shard=lambda b: make_global_batch(
                    {k: v for k, v in b.items() if k != "img_id"}, mesh))
    finally:
        logger.close()
    return state, model, det_cfg, family, time.time() - t0


def eval_variant(cfg, state, model, det_cfg, family, strata_by_img,
                 backend="unbiased", work_dir=None):
    import jax

    from sph_retina_tpu.engine.builder import build_datasets
    from sph_retina_tpu.engine.evaluator import evaluate_dataset

    _, val_loader = build_datasets(cfg, "val")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics, arrays = evaluate_dataset(
        model, det_cfg, variables, val_loader, backend=backend,
        predict=jax.jit(family.predict_fn(model, det_cfg)),
        return_raw=True)
    if work_dir:
        # raw detections + GT per image: lets tools/detection_diagnosis.py
        # decompose an AP delta into FP-flood / missed-GT / localization
        # without retraining (a few MB per seed)
        np.savez_compressed(os.path.join(work_dir, "eval_arrays.npz"),
                            **arrays)
    strat = stratified_metrics(arrays, strata_by_img,
                               cfg["model"]["num_classes"], backend=backend)
    return {"AP50": metrics["AP50"], "mAP": metrics["mAP"],
            "AP75": metrics["AP75"], "n_images": metrics["n_images"],
            "strata": strat}


def load_strata(ann_file):
    with open(ann_file) as f:
        coco = json.load(f)
    return {im["id"]: tuple(im.get("strata", ())) for im in coco["images"]}


def ensure_dataset(root, *, n_train, n_val, num_classes, img_size, seed,
                   box_version=4, regen=False):
    from synth_dataset import write_sphere_bench

    train_ann = os.path.join(root, "annotations", "instances_train.json")
    val_ann = os.path.join(root, "annotations", "instances_val.json")
    # Images are regenerable (fixed seed) and intentionally untracked; a fresh
    # clone has the annotation JSONs but no PNGs — regenerate then, and also
    # when a previous generation was interrupted (check the LAST image of
    # each split, not the first).
    last_imgs = [os.path.join(root, "images", f"train_{n_train:05d}.png"),
                 os.path.join(root, "images", f"val_{n_val:05d}.png")]
    if (regen or not (os.path.exists(train_ann) and os.path.exists(val_ann))
            or not all(os.path.exists(p) for p in last_imgs)):
        print(f"generating sphere-bench at {root} "
              f"({n_train}+{n_val} images, {num_classes} classes, "
              f"box_version {box_version})")
        write_sphere_bench(root, split="train", n_images=n_train,
                           num_classes=num_classes, img_size=img_size,
                           box_version=box_version, seed=seed)
        write_sphere_bench(root, split="val", n_images=n_val,
                           num_classes=num_classes, img_size=img_size,
                           box_version=box_version, seed=seed + 10_000)
    return train_ann, val_ann


def _run_variants(cfg_path, variant_list, *, data_overrides, seeds,
                  max_epochs, out_dir, strata_by_img, prefix=""):
    from sph_retina_tpu.utils.config import apply_overrides, load_config

    results = {}
    for name, overrides in variant_list:
        results[name] = {"overrides": overrides, "seeds": {}}
        for seed in seeds:
            cfg = apply_overrides(load_config(cfg_path),
                                  data_overrides + list(overrides))
            cfg["seed"] = seed
            wd = os.path.join(out_dir, f"{prefix}{name}_s{seed}")
            os.makedirs(wd, exist_ok=True)
            print(f"=== {prefix}{name} seed={seed} -> {wd}")
            try:
                state, model, det_cfg, family, train_s = train_variant(
                    cfg, seed=seed, work_dir=wd, max_epochs=max_epochs)
                m = eval_variant(cfg, state, model, det_cfg, family,
                                 strata_by_img, work_dir=wd)
            except FloatingPointError as e:
                # one diverging variant (NaN-loss hook) must not kill the
                # whole study — record it and keep going
                print(f"    DIVERGED: {e}")
                results[name]["seeds"][str(seed)] = {"error": str(e)}
                continue
            m["train_seconds"] = round(train_s, 1)
            results[name]["seeds"][str(seed)] = m
            print(f"    AP50={m['AP50']:.4f} mAP={m['mAP']:.4f} "
                  f"({train_s:.0f}s train)")
        ok = [s for s in results[name]["seeds"].values() if "AP50" in s]
        results[name]["AP50_mean"] = float(np.mean(
            [s["AP50"] for s in ok])) if ok else None
        results[name]["mAP_mean"] = float(np.mean(
            [s["mAP"] for s in ok])) if ok else None
    return results


def _orderings(results):
    # variants whose every seed diverged have AP50_mean None — no ordering
    results = {k: v for k, v in results.items()
               if v.get("AP50_mean") is not None}
    o = {}
    if "l1" in results and "ciou" in results:
        o["ciou_gt_l1"] = (results["ciou"]["AP50_mean"]
                           > results["l1"]["AP50_mean"])
    if "assign_sph" in results and "ciou" in results:
        o["sph2pob_assign_gt_sph_assign"] = (
            results["ciou"]["AP50_mean"]
            > results["assign_sph"]["AP50_mean"])
        if "assign_fov" in results:
            # reference README.md:36-45 full ordering: Sph2Pob > Fov > Sph
            o["fov_assign_gt_sph_assign"] = (
                results["assign_fov"]["AP50_mean"]
                > results["assign_sph"]["AP50_mean"])
            o["sph2pob_assign_gt_fov_assign"] = (
                results["ciou"]["AP50_mean"]
                > results["assign_fov"]["AP50_mean"])
    return o


def merge_reports(base: dict, new: dict) -> dict:
    """Union of seeds per family/variant (new wins on duplicates); means and
    orderings recomputed from the merged seed sets. Lets follow-up seed
    sweeps fold into a published report instead of replacing it."""
    out = json.loads(json.dumps(new))
    base_fams = base.get("families") or {
        "retinanet": {"base_config": base["base_config"],
                      "variants": base["variants"],
                      "orderings": base.get("orderings", {})}}
    fams = out.setdefault("families", {})
    for fam, bfr in base_fams.items():
        fr = fams.setdefault(fam, {"base_config": bfr["base_config"],
                                   "variants": {}, "orderings": {}})
        for name, bv in bfr["variants"].items():
            v = fr["variants"].setdefault(
                name, {"overrides": bv["overrides"], "seeds": {}})
            if bv["overrides"] != v["overrides"]:
                # A variant whose overrides changed between sweeps must not
                # fold old-config seeds into the new means (advisor r4):
                # the merged row would average heterogeneous runs under the
                # new overrides label.
                print(f"[merge] skipping stale seeds for {fam}/{name}: "
                      f"base overrides {bv['overrides']} != "
                      f"current {v['overrides']}")
                continue
            for s, m in bv["seeds"].items():
                v["seeds"].setdefault(s, m)
    for fr in fams.values():
        for v in fr["variants"].values():
            ok = [m for m in v["seeds"].values() if "AP50" in m]
            v["AP50_mean"] = float(np.mean(
                [m["AP50"] for m in ok])) if ok else None
            v["mAP_mean"] = float(np.mean(
                [m["mAP"] for m in ok])) if ok else None
        fr["orderings"] = _orderings(fr["variants"])
    primary = "retinanet" if "retinanet" in fams else next(iter(fams))
    out["variants"] = fams[primary]["variants"]
    if fams[primary]["orderings"]:
        out["orderings"] = fams[primary]["orderings"]
    out["seeds"] = sorted({int(s) for f in fams.values()
                           for v in f["variants"].values()
                           for s in v["seeds"]})
    return out


def run_study(*, data_root, out_dir, seeds, max_epochs=None, quick=False,
              device=None, variants=None, families=("retinanet",),
              box_version=4, merge_with=None, dataset_gen=None):
    from sph_retina_tpu.utils.device import pin_platform

    pin_platform(device)
    os.makedirs(out_dir, exist_ok=True)
    base_report = None
    if merge_with and os.path.exists(merge_with):
        with open(merge_with) as f:
            base_report = json.load(f)
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")

    if quick:
        gen = dict(n_train=24, n_val=12, num_classes=4, img_size=(128, 256))
        max_epochs = max_epochs or 2
    else:
        gen = dict(n_train=500, n_val=100, num_classes=12,
                   img_size=(256, 512))
    if dataset_gen:
        # pre-generated / differently-sized dataset (e.g. the stress
        # split): record ITS parameters and check ITS last images
        gen.update(dataset_gen)
    _, val_ann = ensure_dataset(data_root, seed=0, box_version=box_version,
                                **gen)
    strata_by_img = load_strata(val_ann)

    data_overrides = [
        f"data.train.ann_file={data_root}/annotations/instances_train.json",
        f"data.train.img_prefix={data_root}/images/",
        f"data.val.ann_file={data_root}/annotations/instances_val.json",
        f"data.val.img_prefix={data_root}/images/",
        f"model.num_classes={gen['num_classes']}",
    ]
    if quick:
        # batch must shard over the data mesh (8 virtual devices in CI)
        data_overrides += ["img_size=(128,256)", "data.samples_per_gpu=8",
                           "lr_config.warmup_iters=10"]

    def assemble(fam_reports):
        primary = ("retinanet" if "retinanet" in fam_reports
                   else next(iter(fam_reports)))
        report = {
            "base_config": fam_reports[primary]["base_config"],
            "dataset": {"root": data_root, "box_version": box_version,
                        **{k: list(v) if isinstance(v, tuple)
                           else v for k, v in gen.items()}},
            "seeds": list(seeds),
            "max_epochs": max_epochs or 24,
            "eval_backend": "unbiased",
            # top-level keys mirror the primary (retinanet) family so
            # earlier consumers of the report keep working; `families`
            # holds every detector family studied.
            "variants": fam_reports[primary]["variants"],
            "families": fam_reports,
        }
        if fam_reports[primary]["orderings"]:
            report["orderings"] = fam_reports[primary]["orderings"]
        if base_report is not None:
            report = merge_reports(base_report, report)
        return report

    path = os.path.join(out_dir, "report.json")
    fam_reports = {}
    report = None
    for fam in families:
        cfg_path = os.path.join(cfg_dir, FAMILY_CONFIGS[fam])
        variant_list = (variants if variants is not None
                        else FAMILY_VARIANTS[fam])
        prefix = "" if fam == "retinanet" else f"{fam}_"
        res = _run_variants(cfg_path, variant_list,
                            data_overrides=data_overrides, seeds=seeds,
                            max_epochs=max_epochs, out_dir=out_dir,
                            strata_by_img=strata_by_img, prefix=prefix)
        fam_reports[fam] = {
            "base_config": f"configs/{FAMILY_CONFIGS[fam]}",
            "variants": res,
            "orderings": _orderings(res),
        }
        # checkpoint the report after every family so an interrupted
        # multi-hour study still leaves its completed families on disk
        report = assemble(fam_reports)
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        write_markdown(report, os.path.join(out_dir, "AP_STUDY.md"))
        print(f"report checkpoint ({fam}): {path}")
    return report


def _variant_table(results):
    lines = [
        "| variant | overrides | AP50 | mAP | polar AP50 | seam AP50 | body AP50 |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, v in results.items():
        def f(x):
            return "-" if x is None else f"{x:.3f}"

        if v.get("AP50_mean") is None:
            err = next(iter(v["seeds"].values())).get("error", "diverged")
            lines.append(f"| {name} | `{'; '.join(v['overrides'])}` "
                         f"| - | - | ({err}) | - | - |")
            continue
        s0 = next(s for s in v["seeds"].values() if "AP50" in s)
        st = s0.get("strata", {})
        lines.append(
            f"| {name} | `{'; '.join(v['overrides']) or '(base)'}` "
            f"| {v['AP50_mean']:.3f} | {v['mAP_mean']:.3f} "
            f"| {f(st.get('polar', {}).get('AP50'))} "
            f"| {f(st.get('seam', {}).get('AP50'))} "
            f"| {f(st.get('body', {}).get('AP50'))} |")
    return lines


def _ordering_lines(o):
    def verdict(k):
        return "reproduced" if o[k] else "NOT reproduced"

    lines = []
    if "ciou_gt_l1" in o:
        lines.append(f"- Sph2Pob-CIoU > L1 (reference README.md:53-60): "
                     f"**{verdict('ciou_gt_l1')}**")
    if "sph2pob_assign_gt_sph_assign" in o:
        lines.append(f"- sph2pob assignment > sph assignment "
                     f"(README.md:36-45): "
                     f"**{verdict('sph2pob_assign_gt_sph_assign')}**")
    if "sph2pob_assign_gt_fov_assign" in o:
        lines += [
            f"- sph2pob assignment > fov assignment (README.md:36-45): "
            f"**{verdict('sph2pob_assign_gt_fov_assign')}**",
            f"- fov assignment > sph assignment (README.md:36-45): "
            f"**{verdict('fov_assign_gt_sph_assign')}**",
        ]
    return lines


def write_markdown(report, path):
    """Regenerate the study markdown. A hand-written ROOT_CAUSE.md next to
    the output (the measured analysis of the orderings — assignment audit,
    disagreement map, control arms) is appended verbatim so report merges
    never clobber it."""
    lines = [
        "# AP-parity study: sphere-bench ablations",
        "",
        "Offline directional reproduction of the reference paper's 360-Indoor"
        " ablations (/root/reference/README.md:36-45,53-60) on the controlled"
        " synthetic ERP benchmark (`tools/synth_dataset.py`); real data is"
        " environment-blocked (zero egress).",
        "",
        f"Base config: `{report['base_config']}` — seeds {report['seeds']},"
        f" {report['max_epochs']} epochs each, unbiased-oracle AP matching.",
        f"Dataset: {report['dataset']}",
        "",
    ]
    lines += _variant_table(report["variants"])
    if "orderings" in report:
        lines += ["", "## Paper orderings", ""]
        lines += _ordering_lines(report["orderings"])
    for fam, fr in report.get("families", {}).items():
        if fr["variants"] == report["variants"]:
            continue  # primary family already rendered above
        lines += ["", f"## Detector family: {fam}",
                  f"Base config: `{fr['base_config']}`", ""]
        lines += _variant_table(fr["variants"])
        if fr.get("orderings"):
            lines += [""]
            lines += _ordering_lines(fr["orderings"])
    root_cause = os.path.join(os.path.dirname(path), "ROOT_CAUSE.md")
    if os.path.exists(root_cause):
        with open(root_cause) as rc:
            lines += ["", rc.read().rstrip()]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data-root", default="work_dirs/sphere_bench")
    p.add_argument("--out", default="work_dirs/ap_study")
    p.add_argument("--seeds", type=int, nargs="*", default=[0])
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--quick", action="store_true",
                   help="tiny dataset + 2 epochs (CI smoke; numbers are "
                        "not meaningful, only the plumbing)")
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--families", nargs="*", default=["retinanet"],
                   choices=sorted(FAMILY_CONFIGS),
                   help="detector families to study (reference "
                        "README.md:53-60 rows)")
    p.add_argument("--box-version", type=int, default=4, choices=(4, 5),
                   help="5 generates an RBFoV dataset (use with the rbfov "
                        "family and a separate --data-root/--out)")
    p.add_argument("--merge-with", default=None,
                   help="existing report.json to merge seeds/families into "
                        "(means + orderings recomputed over the union)")
    args = p.parse_args()
    run_study(data_root=args.data_root, out_dir=args.out, seeds=args.seeds,
              max_epochs=args.max_epochs, quick=args.quick,
              device=args.device, families=tuple(args.families),
              box_version=args.box_version, merge_with=args.merge_with)


if __name__ == "__main__":
    main()
