"""On-disk synthetic spherical COCO dataset for end-to-end tests.

Mirrors the vendored-mmdet test strategy of writing tiny COCO JSON + images
to a tmpdir (SURVEY.md §4B, tests/test_data/test_datasets/test_coco_dataset
there). Objects are bright class-colored rectangles rasterized at the ERP
pixel footprint of their BFoV box, so a detector can genuinely learn from
the images (loss decreases, AP rises on overfit).
"""

from __future__ import annotations

import json
import os

import numpy as np

CLASS_COLORS = np.array(
    [[255, 64, 64], [64, 255, 64], [64, 64, 255],
     [255, 255, 64], [255, 64, 255], [64, 255, 255]], np.uint8)


def write_synthetic_coco(
    root: str,
    n_images: int = 16,
    num_classes: int = 3,
    img_size=(64, 128),
    max_boxes: int = 3,
    box_version: int = 4,
    seed: int = 0,
    split: str = "train",
):
    """Write PNGs + COCO JSON under ``root``; returns (ann_file, img_dir)."""
    from PIL import Image

    h, w = img_size
    img_dir = os.path.join(root, "images")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        canvas = rng.integers(0, 60, (h, w, 3)).astype(np.uint8)  # dark noise
        n = int(rng.integers(1, max_boxes + 1))
        for _ in range(n):
            label = int(rng.integers(0, num_classes))
            theta = float(rng.uniform(40.0, 320.0))
            phi = float(rng.uniform(60.0, 120.0))  # near equator: low distortion
            fx = float(rng.uniform(25.0, 60.0))
            fy = float(rng.uniform(25.0, 55.0))
            box = [theta, phi, fx, fy]
            if box_version == 5:
                box.append(float(rng.uniform(-30.0, 30.0)))
            # ERP pixel footprint (equator approximation)
            x0 = int((theta - fx / 2) / 360.0 * w)
            x1 = int((theta + fx / 2) / 360.0 * w)
            y0 = int((phi - fy / 2) / 180.0 * h)
            y1 = int((phi + fy / 2) / 180.0 * h)
            canvas[max(y0, 0):min(y1, h), max(x0, 0):min(x1, w)] = \
                CLASS_COLORS[label % len(CLASS_COLORS)]
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": label + 1, "bbox": box,
                "area": fx * fy, "iscrowd": 0,
            })
            ann_id += 1
        name = f"{split}_{img_id:04d}.png"
        Image.fromarray(canvas).save(os.path.join(img_dir, name))
        images.append({"id": img_id, "file_name": name,
                       "width": w, "height": h})

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
