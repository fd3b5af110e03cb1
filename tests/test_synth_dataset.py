"""Sphere-bench generator (tools/synth_dataset.py): geometric faithfulness.

The AP-parity study's validity rests on the rendered footprints agreeing
with the evaluation IoU. These tests measure that agreement directly: the
solid-angle-weighted pixel IoU of two rasterized boxes must match the
unbiased spherical IoU oracle (sph_retina_tpu/iou/unbiased.py) to within
ERP discretization error — including at the pole and across the seam,
where the planar approximation of tests/utils/synthetic_coco.py breaks.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from synth_dataset import box_mask, erp_dirs, write_sphere_bench  # noqa: E402


def _pixel_iou(h, w, box1, box2):
    """Solid-angle-weighted IoU of rasterized footprints on an H x W ERP."""
    dirs = erp_dirs(h, w)
    m1, m2 = box_mask(dirs, box1), box_mask(dirs, box2)
    phi = (np.arange(h) + 0.5) / h * np.pi
    wgt = np.broadcast_to(np.sin(phi)[:, None], (h, w))
    inter = wgt[m1 & m2].sum()
    union = wgt[m1 | m2].sum()
    return inter / union


@pytest.mark.parametrize("box1,box2", [
    # equator overlap
    ([100.0, 90.0, 40.0, 30.0], [115.0, 95.0, 40.0, 30.0]),
    # polar: severe ERP distortion
    ([200.0, 20.0, 35.0, 25.0], [215.0, 25.0, 35.0, 25.0]),
    # seam straddlers
    ([355.0, 80.0, 30.0, 40.0], [8.0, 85.0, 30.0, 40.0]),
    # containment
    ([60.0, 110.0, 60.0, 50.0], [60.0, 110.0, 25.0, 20.0]),
])
def test_rendered_footprint_matches_unbiased_oracle(box1, box2):
    from sph_retina_tpu.iou import unbiased_iou

    pix = _pixel_iou(512, 1024, box1, box2)
    ora = float(unbiased_iou(
        np.asarray([box1], np.float32), np.asarray([box2], np.float32),
        is_aligned=True)[0])
    assert ora == pytest.approx(pix, abs=0.015), (pix, ora)


def test_split_is_deterministic_and_well_formed(tmp_path):
    ann1, img_dir = write_sphere_bench(
        str(tmp_path / "a"), split="train", n_images=4, num_classes=5,
        img_size=(64, 128), seed=7)
    ann2, _ = write_sphere_bench(
        str(tmp_path / "b"), split="train", n_images=4, num_classes=5,
        img_size=(64, 128), seed=7)
    with open(ann1) as f:
        coco1 = json.load(f)
    with open(ann2) as f:
        coco2 = json.load(f)
    assert coco1 == coco2  # deterministic in (seed, params)

    name = coco1["images"][0]["file_name"]
    with open(os.path.join(img_dir, name), "rb") as f:
        b1 = f.read()
    with open(os.path.join(str(tmp_path / "b"), "images", name), "rb") as f:
        assert f.read() == b1  # pixel-deterministic too

    assert len(coco1["categories"]) == 5
    assert len(coco1["images"]) == 4
    assert len(coco1["annotations"]) >= 4  # >= 1 box per image requested
    for a in coco1["annotations"]:
        t, p, fx, fy = a["bbox"][:4]
        assert 0.0 <= t <= 360.0 and 0.0 < p < 180.0
        assert 0.0 < fx <= 90.0 and 0.0 < fy <= 90.0
        assert 1 <= a["category_id"] <= 5


def test_strata_tags_cover_polar_and_seam(tmp_path):
    ann, _ = write_sphere_bench(
        str(tmp_path), split="val", n_images=24, num_classes=4,
        img_size=(32, 64), polar_frac=0.5, seam_frac=0.3, seed=3)
    with open(ann) as f:
        coco = json.load(f)
    tags = [s for im in coco["images"] for s in im["strata"]]
    assert "polar" in tags and "seam" in tags


def test_loads_through_sph_coco_dataset(tmp_path):
    """The generated split must load through the real data layer."""
    from sph_retina_tpu.data import DataLoader, SphPipeline
    from sph_retina_tpu.data.coco_sph import SphCocoDataset

    ann, img_dir = write_sphere_bench(
        str(tmp_path), split="train", n_images=6, num_classes=3,
        img_size=(32, 64), seed=1)
    ds = SphCocoDataset(ann_file=ann, img_prefix=img_dir)
    assert ds.num_classes == 3 and len(ds) == 6
    pipe = SphPipeline(img_size=(32, 64), max_gt=16, training=True)
    # num_workers=0 regression: used to hang (ThreadPoolExecutor(0) raised
    # inside the producer thread and the stop sentinel never arrived)
    loader = DataLoader(ds, pipe, batch_size=2, num_workers=0, seed=0)
    batch = next(iter(loader.epoch(0)))
    assert batch["images"].shape == (2, 32, 64, 3)
    assert batch["gt_mask"].any()


def test_loader_producer_errors_propagate(tmp_path):
    """A decode failure must raise in the consumer, not hang it."""
    from sph_retina_tpu.data import DataLoader, SphPipeline
    from sph_retina_tpu.data.coco_sph import SphCocoDataset

    ann, img_dir = write_sphere_bench(
        str(tmp_path), split="train", n_images=2, num_classes=2,
        img_size=(32, 64), seed=2)
    ds = SphCocoDataset(ann_file=ann, img_prefix=img_dir + "_missing")
    loader = DataLoader(ds, SphPipeline(img_size=(32, 64), max_gt=8),
                        batch_size=2, num_workers=2, seed=0)
    with pytest.raises(FileNotFoundError):
        next(iter(loader.epoch(0)))


def test_ensure_dataset_regenerates_interrupted_generation(tmp_path):
    """A partially-generated dataset (killed mid-write: annotations exist,
    trailing images missing) must be regenerated, not silently reused —
    the check is on the LAST image of each split."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from ap_study import ensure_dataset

    root = str(tmp_path / "bench")
    kw = dict(n_train=6, n_val=3, num_classes=3, img_size=(64, 128), seed=0)
    ensure_dataset(root, **kw)
    last = os.path.join(root, "images", "train_00006.png")
    assert os.path.exists(last)

    # simulate an interrupted generation: last train image missing
    os.remove(last)
    ensure_dataset(root, **kw)
    assert os.path.exists(last)

    # fully present dataset is NOT regenerated (mtime unchanged)
    mtime = os.path.getmtime(last)
    ensure_dataset(root, **kw)
    assert os.path.getmtime(last) == mtime
