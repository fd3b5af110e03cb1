#!/usr/bin/env python
"""Controlled synthetic ERP detection benchmark ("sphere-bench").

Purpose: a nontrivial, *geometrically faithful* on-disk COCO dataset for the
AP-parity ablation study (tools/ap_study.py) — the offline stand-in for the
360-Indoor / PANDORA experiments of the reference paper
(/root/reference/README.md:53-60), which need real data this environment
cannot fetch (zero egress).

Faithful means: every object is rasterized at the EXACT spherical footprint
of its BFoV annotation. A pixel belongs to a box iff its unit direction
vector lies inside all four great-circle boundary half-spaces — the same
inside test the unbiased IoU oracle uses (sph_retina_tpu/iou/unbiased.py
``_box_planes_and_corners``; reference getNormal, unbiased_iou_bfov.py:14-43).
So at high latitude the painted region curves and widens exactly the way the
evaluation IoU says it should, and spherical-aware losses/assignment have a
genuine geometric signal to exploit — unlike the equator-approximation
rectangles of tests/utils/synthetic_coco.py, which are only honest near
phi = 90.

Controlled difficulty (VERDICT r2 item 3: "occlusion, pole and seam objects,
size spread"):

- latitude strata: a configurable fraction of objects is polar
  (phi in [12, 38] or [142, 168] deg) where ERP distortion is severe;
- seam straddlers: a fraction of objects crosses theta = 0/360;
- size spread: log-uniform FoV in [12, 85] deg with free aspect;
- occlusion: a fraction of objects gets a partner box overlapping it,
  painted later (z-order overwrite), annotation keeps the full extent;
- texture: per-instance checker pattern + brightness jitter over a smooth
  noise background, so classification is color-driven but not one-pixel
  trivial.

Images carry ``strata`` tags ("polar"/"seam"), so the study can report
stratified AP. Output layout matches SphCocoDataset expectations:
bbox = [theta, phi, fov_x, fov_y] degrees (box_version 4; 5 adds gamma).

CLI:
    python tools/synth_dataset.py --root work_dirs/sphere_bench \
        --n-train 500 --n-val 100 --num-classes 12 --img-size 256 512
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# 12 well-separated class colors (RGB).
CLASS_COLORS = np.array([
    [230, 60, 50], [60, 200, 60], [55, 90, 230], [240, 210, 50],
    [220, 60, 220], [60, 220, 220], [240, 140, 40], [140, 70, 220],
    [120, 220, 120], [220, 120, 140], [90, 150, 200], [200, 200, 200],
], np.uint8)


def box_planes(box_deg: np.ndarray) -> np.ndarray:
    """Boundary plane normals (4, 3) of a BFoV/RBFoV box in degrees.

    Mirrors sph_retina_tpu.iou.unbiased._box_planes_and_corners so the
    rendered footprint is pixel-consistent with the unbiased IoU used for
    AP matching. A direction p is inside iff (p @ normals.T >= 0).all().
    """
    b = np.deg2rad(np.asarray(box_deg, np.float64))
    theta, phi, hx, hy = b[0], b[1], b[2] / 2.0, b[3] / 2.0
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    look = np.array([sp * ct, sp * st, cp])
    right = np.array([-st, ct, 0.0])
    up = np.array([-cp * ct, -cp * st, sp])
    shx, chx = np.sin(hx), np.cos(hx)
    shy, chy = np.sin(hy), np.cos(hy)
    normals = np.stack([
        -chx * right + shx * look,
        chx * right + shx * look,
        -chy * up + shy * look,
        chy * up + shy * look,
    ])
    if b.shape[0] == 5:  # RBFoV: rotate normals about the view axis
        g = b[4]
        cg, sg = np.cos(g), np.sin(g)
        cross = np.cross(np.broadcast_to(look, normals.shape), normals)
        dots = normals @ look
        normals = normals * cg + cross * sg + look[None] * dots[:, None] * (1 - cg)
    return normals


def erp_dirs(h: int, w: int) -> np.ndarray:
    """(H, W, 3) unit direction of each ERP pixel center.

    Convention of geometry/boxes.py:16: x = sin(phi) cos(theta),
    y = sin(phi) sin(theta), z = cos(phi); theta = x-pixel / W * 360,
    phi = y-pixel / H * 180 (colatitude, equator at phi = 90).
    """
    theta = (np.arange(w) + 0.5) / w * 2.0 * np.pi
    phi = (np.arange(h) + 0.5) / h * np.pi
    sp, cp = np.sin(phi)[:, None], np.cos(phi)[:, None]
    st, ct = np.sin(theta)[None, :], np.cos(theta)[None, :]
    return np.stack([sp * ct, sp * st, np.broadcast_to(cp, (h, w))], axis=-1)


def box_mask(dirs: np.ndarray, box_deg) -> np.ndarray:
    """(H, W) bool footprint of the box on the ERP grid."""
    normals = box_planes(np.asarray(box_deg))
    return (dirs @ normals.T >= 0.0).all(axis=-1)


def _smooth_background(rng, h, w):
    """Low-frequency noise background (bilinear-upsampled coarse grid)."""
    coarse = rng.uniform(15, 75, (h // 16 + 2, w // 16 + 2, 3))
    ys = np.linspace(0, coarse.shape[0] - 1.001, h)
    xs = np.linspace(0, coarse.shape[1] - 1.001, w)
    y0, x0 = ys.astype(int), xs.astype(int)
    fy, fx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    img = (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
           + c10 * fy * (1 - fx) + c11 * fy * fx)
    return img.astype(np.uint8)


def _sample_box(rng, stratum: str, fov_range=(12.0, 85.0)):
    """One BFoV box (degrees) from a difficulty stratum."""
    lo, hi = np.log(fov_range[0]), np.log(fov_range[1])
    fx = float(np.exp(rng.uniform(lo, hi)))
    fy = float(np.clip(fx * np.exp(rng.uniform(-0.5, 0.5)),
                       fov_range[0], fov_range[1]))
    if stratum == "polar":
        phi = float(rng.uniform(12.0, 38.0)) if rng.random() < 0.5 \
            else float(rng.uniform(142.0, 168.0))
        theta = float(rng.uniform(0.0, 360.0))
    elif stratum == "seam":
        phi = float(rng.uniform(45.0, 135.0))
        theta = float(rng.uniform(-15.0, 15.0) % 360.0)
    else:
        phi = float(rng.uniform(40.0, 140.0))
        theta = float(rng.uniform(25.0, 335.0))
    return [theta, phi, fx, fy]


def write_sphere_bench(
    root: str,
    split: str = "train",
    n_images: int = 500,
    num_classes: int = 12,
    img_size=(256, 512),
    boxes_per_image=(2, 6),
    polar_frac: float = 0.35,
    seam_frac: float = 0.20,
    occlusion_frac: float = 0.30,
    box_version: int = 4,
    seed: int = 0,
    fov_range=(12.0, 85.0),
):
    """Write the benchmark split; returns (ann_file, img_dir).

    Deterministic in (seed, parameters). Image entries carry a ``strata``
    list tagging pole/seam content for stratified evaluation.
    """
    from PIL import Image

    h, w = img_size
    img_dir = os.path.join(root, "images")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    dirs = erp_dirs(h, w)
    checker = ((np.arange(h)[:, None] // 4 + np.arange(w)[None, :] // 4) % 2
               ).astype(np.float32) * 0.25 + 0.75  # (H, W) in {0.75, 1.0}

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        canvas = _smooth_background(rng, h, w).astype(np.float32)
        n = int(rng.integers(boxes_per_image[0], boxes_per_image[1] + 1))
        strata = set()
        recs = []
        for _ in range(n):
            u = rng.random()
            stratum = ("polar" if u < polar_frac
                       else "seam" if u < polar_frac + seam_frac
                       else "body")
            box = _sample_box(rng, stratum, fov_range=fov_range)
            if box_version == 5:
                box.append(float(rng.uniform(-45.0, 45.0)))
            label = int(rng.integers(0, num_classes))
            recs.append((box, label))
            if stratum != "body":
                strata.add(stratum)
            # occlusion partner: overlaps `box`, painted after it
            if rng.random() < occlusion_frac:
                t, p, fx, fy = box[:4]
                part = [
                    float((t + rng.uniform(-0.6, 0.6) * fx) % 360.0),
                    float(np.clip(p + rng.uniform(-0.6, 0.6) * fy, 5.0, 175.0)),
                    float(np.clip(fx * np.exp(rng.uniform(-0.4, 0.2)),
                                  *fov_range)),
                    float(np.clip(fy * np.exp(rng.uniform(-0.4, 0.2)),
                                  *fov_range)),
                ]
                if box_version == 5:
                    part.append(float(rng.uniform(-45.0, 45.0)))
                recs.append((part, int(rng.integers(0, num_classes))))

        for box, label in recs:  # later recs overwrite -> real occlusion
            m = box_mask(dirs, box)
            color = CLASS_COLORS[label].astype(np.float32)
            jitter = float(rng.uniform(0.85, 1.15))
            canvas[m] = np.clip(color[None, :] * (checker[m] * jitter)[:, None],
                                0, 255)
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": label + 1,
                "bbox": [round(v, 4) for v in box],
                "area": round(box[2] * box[3], 2), "iscrowd": 0,
            })
            ann_id += 1

        name = f"{split}_{img_id:05d}.png"
        Image.fromarray(canvas.astype(np.uint8)).save(
            os.path.join(img_dir, name))
        images.append({"id": img_id, "file_name": name, "width": w,
                       "height": h, "strata": sorted(strata)})

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": i + 1, "name": f"class_{i}"}
                       for i in range(num_classes)],
    }
    ann_file = os.path.join(ann_dir, f"instances_{split}.json")
    with open(ann_file, "w") as f:
        json.dump(coco, f)
    return ann_file, img_dir


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", default="work_dirs/sphere_bench")
    p.add_argument("--n-train", type=int, default=500)
    p.add_argument("--n-val", type=int, default=100)
    p.add_argument("--num-classes", type=int, default=12)
    p.add_argument("--img-size", type=int, nargs=2, default=(256, 512))
    p.add_argument("--box-version", type=int, default=4, choices=(4, 5))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    for split, n, seed in (("train", args.n_train, args.seed),
                           ("val", args.n_val, args.seed + 10_000)):
        ann, img_dir = write_sphere_bench(
            args.root, split=split, n_images=n,
            num_classes=args.num_classes, img_size=tuple(args.img_size),
            box_version=args.box_version, seed=seed)
        print(f"{split}: {n} images -> {ann}")


if __name__ == "__main__":
    main()
