"""Data pipeline + COCO-style spherical evaluation."""

import json

import numpy as np
import pytest

from sph_retina_tpu.data import (
    DataLoader,
    SphCocoDataset,
    SphPipeline,
    make_synthetic_dataset,
)
from sph_retina_tpu.engine.eval import eval_spherical_map
from sph_retina_tpu.geometry import generate_boxes


def _write_coco(tmp_path, n_images=4, box_version=4):
    cats = [{"id": i + 1, "name": f"c{i}"} for i in range(3)]
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": 128, "height": 64})
        boxes = generate_boxes(3, box_version, seed=i, fov_range=(10, 50))
        for b in boxes:
            annotations.append({
                "id": aid, "image_id": i,
                "category_id": (aid % 3) + 1,
                "bbox": [float(v) for v in b],
                "iscrowd": 0, "area": 1.0,
            })
            aid += 1
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}))
    return str(path)


def test_coco_dataset_parses(tmp_path):
    ann = _write_coco(tmp_path)
    ds = SphCocoDataset(ann_file=ann)
    assert len(ds) == 4
    assert ds.num_classes == 3
    item = ds[0]
    assert item["boxes"].shape == (3, 4)
    assert item["labels"].shape == (3,)
    assert item["img_path"].endswith("0.jpg")


def test_pipeline_flip_and_pad():
    pipe = SphPipeline(img_size=(64, 128), flip_ratio=1.0, max_gt=8)
    item = {
        "image": np.zeros((32, 64, 3), np.uint8),
        "boxes": np.array([[100.0, 90.0, 30.0, 30.0]], np.float32),
        "labels": np.array([2], np.int32),
    }
    out = pipe(item, np.random.default_rng(0))
    assert out["images"].shape == (64, 128, 3)
    assert out["gt_boxes"].shape == (8, 4)
    # flipped: theta -> 360 - 100
    np.testing.assert_allclose(out["gt_boxes"][0, 0], 260.0)
    assert out["gt_mask"].sum() == 1
    assert out["gt_labels"][0] == 2


def test_loader_batches():
    ds = make_synthetic_dataset(n_images=6, img_size=(32, 64))
    pipe = SphPipeline(img_size=(32, 64), max_gt=8)
    loader = DataLoader(ds, pipe, batch_size=2, num_workers=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 32, 64, 3)
    assert b["gt_boxes"].shape == (2, 8, 4)
    assert b["gt_mask"].dtype == bool
    # determinism
    batches2 = list(loader.epoch(0))
    np.testing.assert_allclose(b["images"], batches2[0]["images"])


def _ann(boxes, labels):
    return {"boxes": np.asarray(boxes, np.float32),
            "labels": np.asarray(labels, np.int32)}


def test_eval_perfect_detections():
    boxes = generate_boxes(5, 4, seed=0, fov_range=(20, 60))
    anns = [_ann(boxes, [0, 1, 2, 0, 1])]
    dets = [(boxes, np.linspace(0.9, 0.5, 5), np.array([0, 1, 2, 0, 1]))]
    res = eval_spherical_map(dets, anns, num_classes=3,
                             backend="sph2pob_efficient")
    assert res["mAP"] > 0.95
    assert res["AP50"] > 0.99


def test_eval_half_recall():
    boxes = generate_boxes(4, 4, seed=1, fov_range=(20, 60))
    anns = [_ann(boxes, [0, 0, 0, 0])]
    dets = [(boxes[:2], np.array([0.9, 0.8]), np.array([0, 0]))]
    res = eval_spherical_map(dets, anns, num_classes=1, iou_thrs=(0.5,),
                             backend="sph2pob_efficient")
    # 2 of 4 gts found, no FPs -> AP ~ 0.5 (101-pt interp)
    assert res["mAP"] == pytest.approx(0.5, abs=0.02)


def test_eval_wrong_class_is_fp():
    boxes = generate_boxes(2, 4, seed=2, fov_range=(20, 60))
    anns = [_ann(boxes, [0, 0])]
    dets = [(boxes, np.array([0.9, 0.8]), np.array([1, 1]))]
    res = eval_spherical_map(dets, anns, num_classes=2, iou_thrs=(0.5,),
                             backend="sph2pob_efficient")
    assert res["mAP"] == 0.0


def test_eval_duplicate_detection_penalized():
    boxes = generate_boxes(1, 4, seed=3, fov_range=(30, 60))
    anns = [_ann(boxes, [0])]
    dup = np.concatenate([boxes, boxes])
    dets = [(dup, np.array([0.9, 0.8]), np.array([0, 0]))]
    res = eval_spherical_map(dets, anns, num_classes=1, iou_thrs=(0.5,),
                             backend="sph2pob_efficient")
    # one TP + one FP at lower score: precision dips after recall=1
    assert 0.9 < res["mAP"] <= 1.0


def _eval_loop_reference(det_results, annotations, num_classes, iou_thrs,
                         backend, max_dets=100):
    """The pre-vectorization matcher (python loop per class x threshold x
    detection), kept verbatim as the semantic oracle for the vectorized
    implementation (no ignore-region support — plain COCO greedy)."""
    from sph_retina_tpu.engine.eval import (
        _average_precision, _pairwise_iou_np,
    )

    n_imgs = len(det_results)
    iou_mats, ordered = [], []
    for (boxes, scores, labels), ann in zip(det_results, annotations):
        order = np.argsort(-np.asarray(scores), kind="stable")[:max_dets]
        boxes = np.asarray(boxes)[order]
        iou_mats.append(_pairwise_iou_np(boxes, np.asarray(ann["boxes"]),
                                         backend))
        ordered.append((boxes, np.asarray(scores)[order],
                        np.asarray(labels)[order]))

    ap = np.zeros((len(iou_thrs), num_classes))
    valid_class = np.zeros(num_classes, bool)
    for c in range(num_classes):
        recs, n_gt_total, per_img_gt_idx = [], 0, []
        for i in range(n_imgs):
            gt_idx = np.where(np.asarray(annotations[i]["labels"]) == c)[0]
            per_img_gt_idx.append(gt_idx)
            n_gt_total += len(gt_idx)
            _, scores, labels = ordered[i]
            for k in np.where(labels == c)[0]:
                recs.append((float(scores[k]), i, int(k)))
        if n_gt_total == 0:
            continue
        valid_class[c] = True
        recs.sort(key=lambda r: -r[0])
        for t_i, thr in enumerate(iou_thrs):
            matched = [np.zeros(len(g), bool) for g in per_img_gt_idx]
            tp = np.zeros(len(recs))
            fp = np.zeros(len(recs))
            for r_i, (_, img, det_k) in enumerate(recs):
                gt_idx = per_img_gt_idx[img]
                if len(gt_idx) == 0:
                    fp[r_i] = 1
                    continue
                ious = iou_mats[img][det_k, gt_idx]
                cand = np.where(~matched[img], ious, -1.0)
                best = int(np.argmax(cand))
                if cand[best] >= thr:
                    matched[img][best] = True
                    tp[r_i] = 1
                else:
                    fp[r_i] = 1
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            recall = ctp / n_gt_total
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            ap[t_i, c] = _average_precision(recall, precision)
    mean_over_cls = (ap[:, valid_class].mean(axis=1) if valid_class.any()
                     else np.zeros(len(iou_thrs)))
    return float(mean_over_cls.mean()), ap


def test_eval_vectorized_matches_loop_reference():
    """Property test: the vectorized greedy matcher reproduces the loop
    implementation exactly over random multi-image multi-class workloads
    (VERDICT r2 item 7)."""
    rng = np.random.default_rng(42)
    thrs = (0.3, 0.5, 0.75)
    for trial in range(4):
        n_imgs = int(rng.integers(1, 5))
        num_classes = int(rng.integers(1, 4))
        dets, anns = [], []
        for i in range(n_imgs):
            n_gt = int(rng.integers(0, 6))
            gt = generate_boxes(max(n_gt, 1), 4, seed=100 * trial + i,
                                fov_range=(15, 70))[:n_gt]
            anns.append(_ann(gt, rng.integers(0, num_classes, n_gt)))
            n_det = int(rng.integers(0, 8))
            # mix: jittered copies of gts (likely matches) + random boxes
            rows = []
            for _ in range(n_det):
                if n_gt and rng.random() < 0.6:
                    rows.append(gt[rng.integers(0, n_gt)]
                                + rng.normal(0, 3, 4).astype(np.float32))
                else:
                    rows.append(generate_boxes(
                        1, 4, seed=int(rng.integers(1 << 30)),
                        fov_range=(15, 70))[0])
            det_boxes = (np.clip(np.stack(rows), 1.0, 179.0) if rows
                         else np.zeros((0, 4), np.float32))
            scores = rng.random(n_det)  # distinct w.p. 1
            labels = rng.integers(0, num_classes, n_det)
            dets.append((det_boxes.astype(np.float32), scores, labels))
        res = eval_spherical_map(dets, anns, num_classes, iou_thrs=thrs,
                                 backend="sph2pob_efficient")
        ref_map, ref_ap = _eval_loop_reference(dets, anns, num_classes, thrs,
                                               "sph2pob_efficient")
        np.testing.assert_allclose(res["per_class"], ref_ap, atol=1e-12)
        assert res["mAP"] == pytest.approx(ref_map, abs=1e-12)


def test_eval_crowd_region_not_fp():
    """A detection overlapping a same-class crowd/ignore region is excluded
    from scoring (COCO iscrowd semantics), not counted as a false positive;
    the crowd GT adds nothing to the recall denominator (VERDICT r2 item 6)."""
    gt = generate_boxes(2, 4, seed=5, fov_range=(30, 60))
    crowd = generate_boxes(1, 4, seed=77, fov_range=(40, 80))
    anns = [{
        "boxes": gt, "labels": np.array([0, 0], np.int32),
        "ignore_boxes": crowd, "ignore_labels": np.array([0], np.int32),
    }]
    # two perfect dets + one det inside the crowd region (high score, so it
    # would crush precision if scored as FP)
    dets = [(np.concatenate([crowd, gt]),
             np.array([0.95, 0.9, 0.8]), np.array([0, 0, 0], np.int32))]
    res = eval_spherical_map(dets, anns, num_classes=1, iou_thrs=(0.5,),
                             backend="sph2pob_efficient")
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    # same dets with NO ignore region: the crowd det is now a top-score FP
    anns_plain = [_ann(gt, [0, 0])]
    res2 = eval_spherical_map(dets, anns_plain, num_classes=1,
                              iou_thrs=(0.5,), backend="sph2pob_efficient")
    assert res2["mAP"] < 0.9


def test_eval_crowd_wrong_class_still_fp():
    """Ignore regions are per-class: a det of another class over the crowd
    box is still a false positive."""
    gt = generate_boxes(2, 4, seed=5, fov_range=(30, 60))
    crowd = generate_boxes(1, 4, seed=77, fov_range=(40, 80))
    anns = [{
        "boxes": gt, "labels": np.array([0, 0], np.int32),
        "ignore_boxes": crowd, "ignore_labels": np.array([1], np.int32),
    }]
    dets = [(np.concatenate([crowd, gt]),
             np.array([0.95, 0.9, 0.8]), np.array([0, 0, 0], np.int32))]
    res = eval_spherical_map(dets, anns, num_classes=2, iou_thrs=(0.5,),
                             backend="sph2pob_efficient")
    assert res["mAP"] < 0.9


def test_coco_dataset_carries_crowd_as_ignore(tmp_path):
    """iscrowd annotations flow dataset -> pipeline -> eval annotations
    instead of being silently dropped."""
    cats = [{"id": 1, "name": "c0"}]
    boxes = generate_boxes(2, 4, seed=0, fov_range=(20, 50))
    annotations = [
        {"id": 1, "image_id": 0, "category_id": 1,
         "bbox": [float(v) for v in boxes[0]], "iscrowd": 0, "area": 1.0},
        {"id": 2, "image_id": 0, "category_id": 1,
         "bbox": [float(v) for v in boxes[1]], "iscrowd": 1, "area": 1.0},
    ]
    path = tmp_path / "ann.json"
    path.write_text(json.dumps({
        "images": [{"id": 0, "file_name": "0.jpg", "width": 64, "height": 32}],
        "annotations": annotations, "categories": cats}))
    ds = SphCocoDataset(ann_file=str(path))
    item = ds[0]
    assert item["boxes"].shape == (1, 4)
    assert item["ignore_boxes"].shape == (1, 4)
    np.testing.assert_allclose(item["ignore_boxes"][0], boxes[1], atol=1e-5)

    pipe = SphPipeline(img_size=(32, 64), flip_ratio=1.0, max_gt=4,
                       max_ignore=4)
    item["image"] = np.zeros((32, 64, 3), np.uint8)
    out = pipe(item, np.random.default_rng(0))
    assert out["ig_boxes"].shape == (4, 4)
    assert out["ig_mask"].sum() == 1
    # the flip applied to ignore boxes too
    np.testing.assert_allclose(out["ig_boxes"][0, 0], 360.0 - boxes[1, 0],
                               rtol=1e-6)
    assert out["ig_labels"][0] == 0


def test_uint8_pipeline_device_normalize_identical():
    """normalize_on_device=True ships uint8 and normalizes inside the jitted
    step — bitwise the same fp32 values as host-side normalization (source
    pixels are uint8 either way), at 1/4 the host->device bytes."""
    import jax.numpy as jnp

    from sph_retina_tpu.engine.train import maybe_normalize_images

    rng_img = np.random.default_rng(0)
    item = {
        "image": rng_img.integers(0, 256, (32, 64, 3), np.uint8),
        "boxes": np.array([[100.0, 90.0, 30.0, 30.0]], np.float32),
        "labels": np.array([1], np.int32),
    }
    host = SphPipeline(img_size=(32, 64), flip_ratio=1.0, max_gt=4)
    dev = SphPipeline(img_size=(32, 64), flip_ratio=1.0, max_gt=4,
                      normalize_on_device=True)
    out_host = host(dict(item), np.random.default_rng(3))
    out_dev = dev(dict(item), np.random.default_rng(3))
    assert out_dev["images"].dtype == np.uint8
    normed = np.asarray(maybe_normalize_images(jnp.asarray(out_dev["images"])))
    np.testing.assert_array_equal(normed, out_host["images"])
    # float inputs pass through untouched
    passthrough = maybe_normalize_images(jnp.asarray(out_host["images"]))
    np.testing.assert_array_equal(np.asarray(passthrough), out_host["images"])


def test_native_loader_matches_pil(tmp_path):
    from sph_retina_tpu.data import native_loader as nl
    from sph_retina_tpu.data.pipeline import (
        IMAGENET_MEAN, IMAGENET_STD, SphPipeline,
    )
    if not nl.available():
        import pytest

        pytest.skip("native loader not built")
    from PIL import Image

    # smooth gradient: PIL's downscale uses area averaging while the
    # native path point-samples bilinearly — identical on smooth content
    yy, xx = np.mgrid[0:64, 0:128]
    img = np.stack([xx * 2, yy * 4, (xx + yy)], -1).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = nl.load_image(p, (32, 64), IMAGENET_MEAN, IMAGENET_STD)
    assert out.shape == (32, 64, 3)
    pipe = SphPipeline(img_size=(32, 64), training=False)
    ref = pipe.normalize(pipe.resize(pipe.load_image(p)))
    assert np.abs(out - ref).mean() < 0.05
    batch, failed = nl.load_batch([p, p], (32, 64), IMAGENET_MEAN,
                                  IMAGENET_STD, flips=[0, 1])
    assert failed == 0
    np.testing.assert_allclose(batch[1], batch[0][:, ::-1], atol=1e-6)
    # missing file -> failure count, zeroed slot
    batch, failed = nl.load_batch([p, "/nonexistent.jpg"], (32, 64),
                                  IMAGENET_MEAN, IMAGENET_STD)
    assert failed == 1
    assert np.all(batch[1] == 0)


def test_native_loader_u8_path(tmp_path):
    """The uint8 native path (normalize_on_device) keeps the C++ fast path:
    decode+resize+flip in C++, PIL-equivalent uint8 quantization, and
    device-normalized values within one quantum of the fused float path."""
    from sph_retina_tpu.data import native_loader as nl
    from sph_retina_tpu.data.pipeline import (
        IMAGENET_MEAN, IMAGENET_STD, SphPipeline,
    )
    if not nl.available():
        import pytest

        pytest.skip("native loader not built")
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 128, 3), np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    # same-size: identity decode, and flip semantics
    np.testing.assert_array_equal(nl.load_image_u8(p, (64, 128)), img)
    np.testing.assert_array_equal(
        nl.load_image_u8(p, (64, 128), flip=True), img[:, ::-1])
    # resized: normalize(u8) matches the fused float path up to the uint8
    # quantization step (0.5 / std per channel)
    u8 = nl.load_image_u8(p, (32, 64)).astype(np.float32)
    f32 = nl.load_image(p, (32, 64), IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_allclose((u8 - IMAGENET_MEAN) / IMAGENET_STD, f32,
                               atol=0.5 / IMAGENET_STD.min())
    # the pipeline selects the u8 native path for on-disk items
    pipe = SphPipeline(img_size=(32, 64), max_gt=4, training=False,
                       normalize_on_device=True)
    out = pipe({"img_path": p, "boxes": np.zeros((0, 4), np.float32),
                "labels": np.zeros((0,), np.int32)},
               np.random.default_rng(0))
    assert out["images"].dtype == np.uint8
    np.testing.assert_array_equal(out["images"], u8.astype(np.uint8))


def test_yuv420_transfer_close_to_rgb(tmp_path):
    """transfer_colorspace='yuv420' ships a packed I420 chart at half the
    bytes of RGB uint8; after device-side chroma upsample + YCbCr->RGB +
    normalize, pixels match the RGB path within JPEG-noise tolerance
    (chroma was 4:2:0 in the JPEG source to begin with)."""
    import jax.numpy as jnp
    from PIL import Image

    from sph_retina_tpu.data import native_loader as nl
    from sph_retina_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from sph_retina_tpu.engine.train import maybe_normalize_images

    # smooth gradients: chroma subsampling is exact on smooth content
    # (sharp chroma edges genuinely lose information at 4:2:0 — as they
    # already do inside any 4:2:0 JPEG)
    yy, xx = np.mgrid[0:64, 0:128]
    img = np.stack([xx * 2, yy * 3, xx + yy], -1).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=92)
    item = {"img_path": p, "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int32)}

    rgb_pipe = SphPipeline(img_size=(32, 64), max_gt=4, training=False,
                           normalize_on_device=True)
    yuv_pipe = SphPipeline(img_size=(32, 64), max_gt=4, training=False,
                           normalize_on_device=True,
                           transfer_colorspace="yuv420")
    rgb = rgb_pipe(dict(item), np.random.default_rng(0))["images"]
    yuv = yuv_pipe(dict(item), np.random.default_rng(0))["images"]
    assert yuv.shape == (48, 64) and yuv.dtype == np.uint8  # (H*3/2, W)
    a = np.asarray(maybe_normalize_images(jnp.asarray(rgb[None])))
    b = np.asarray(maybe_normalize_images(jnp.asarray(yuv[None])))
    assert b.shape == (1, 32, 64, 3)
    pix_err = np.abs((a - b) * IMAGENET_STD)
    assert pix_err.mean() < 1.5 and pix_err.max() < 16.0

    # host fallback pack (non-native sources) agrees with the same bound
    packed = rgb_pipe.pack_yuv420(rgb)
    c = np.asarray(maybe_normalize_images(jnp.asarray(packed[None])))
    assert np.abs((a - c) * IMAGENET_STD).mean() < 1.5

    if nl.available() and hasattr(nl._load(), "sph_load_image_yuv"):
        # native flip flips all three planes consistently
        fl = nl.load_image_yuv(p, (32, 64), flip=True)
        nf = nl.load_image_yuv(p, (32, 64), flip=False)
        bf = np.asarray(maybe_normalize_images(jnp.asarray(fl[None])))
        bn = np.asarray(maybe_normalize_images(jnp.asarray(nf[None])))
        np.testing.assert_allclose(bf, bn[:, :, ::-1], atol=1e-5)

    with pytest.raises(ValueError):
        SphPipeline(transfer_colorspace="yuv420")  # needs device normalize
    with pytest.raises(ValueError):
        SphPipeline(transfer_colorspace="bgr")


def test_prefetch_to_device_order_and_error():
    """prefetch_to_device yields transferred batches in order and surfaces
    producer/transfer exceptions in the consumer (transfers run on a
    background thread because device_put can block on slow host links)."""
    from sph_retina_tpu.data.loader import prefetch_to_device

    out = list(prefetch_to_device(iter(range(7)), lambda x: x * 10, depth=2))
    assert out == [0, 10, 20, 30, 40, 50, 60]

    def boom(x):
        if x == 3:
            raise RuntimeError("decode failed")
        return x

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for v in prefetch_to_device(iter(range(7)), boom, depth=2):
            got.append(v)
    assert got == [0, 1, 2]


def test_diff_seed_changes_aug_not_shuffle():
    """--diff-seed parity: aug_seed varies the per-sample augmentation
    streams only; the shuffle permutation (shard partitioning) must stay
    identical across ranks."""
    from sph_retina_tpu.data import DataLoader, SphPipeline
    from sph_retina_tpu.data.loader import make_synthetic_dataset

    ds = make_synthetic_dataset(n_images=8, num_classes=3, img_size=(32, 64))
    pipe = SphPipeline(img_size=(32, 64), flip_ratio=0.5, max_gt=8,
                       training=True)
    mk = lambda aug: DataLoader(ds, pipe, batch_size=4, seed=7, aug_seed=aug,
                                num_workers=1, prefetch=1)
    a, b, c = mk(None), mk(7), mk(1007)
    np.testing.assert_array_equal(a._epoch_indices(0), c._epoch_indices(0))
    ba = next(iter(a.epoch(0)))["images"]
    bb = next(iter(b.epoch(0)))["images"]
    bc = next(iter(c.epoch(0)))["images"]
    np.testing.assert_array_equal(ba, bb)  # aug_seed defaults to seed
    assert not np.array_equal(ba, bc)      # different stream -> different aug


def test_native_loader_foreign_host_binary_rebuilt():
    """A libsphloader.so carried over from another machine (-march=native:
    SIGILL hazard) must be detected via the host-fingerprint marker and
    rebuilt, not loaded because its mtime looks fresh."""
    import pytest

    from sph_retina_tpu.data import native_loader as nl

    if not nl.available():
        pytest.skip("native loader not built")
    assert nl._built_on_this_host()  # marker written by the build above
    # simulate a binary built elsewhere: fingerprint mismatch
    with open(nl._host_marker(), "w") as f:
        f.write("deadbeefdead")
    assert not nl._built_on_this_host()
    nl._lib = None  # drop the cached handle to force the load path
    assert nl.available()  # forced `make -B` rebuilt for this host
    assert nl._built_on_this_host()


# --------------------------------------------------------------------------- #
# VOC-style eval_map: live differential vs the reference's own mean_ap.py
# --------------------------------------------------------------------------- #
def _voc_differential_dataset(seed, n_imgs=6, n_cls=4):
    """Random detections/GT twice: spherical format for eval_voc_map and
    the reference eval_map format (per-class xyxy+score lists).

    Boxes stay away from the seam/poles and inside the chart so the
    ``naive`` (planar-chart) backend IoU equals the reference's
    ``bbox_overlaps`` on the xyxy conversion exactly (linear deg->pix
    mapping; IoU is invariant to per-axis linear scaling).
    """
    rng = np.random.default_rng(seed)

    def xyxy(b):
        return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2],
                        axis=-1).astype(np.float32)

    def rand_boxes(n):
        return np.stack([rng.uniform(60, 300, n), rng.uniform(45, 135, n),
                         rng.uniform(5, 40, n), rng.uniform(5, 40, n)],
                        axis=-1).astype(np.float32)

    det_results, annotations, ref_dets, ref_anns = [], [], [], []
    for _ in range(n_imgs):
        g = int(rng.integers(1, 6))
        gt, gl = rand_boxes(g), rng.integers(0, n_cls, g).astype(np.int32)
        n_ig = int(rng.integers(0, 3))
        ig = rand_boxes(n_ig)
        igl = rng.integers(0, n_cls, n_ig).astype(np.int32)

        dets, dlabels = [], []
        for b, lab in zip(gt, gl):
            for _ in range(int(rng.integers(1, 4))):
                j = b + rng.normal(0, [4, 4, 5, 5])
                j[2:] = np.clip(j[2:], 3, 60)
                j[:2] = np.clip(j[:2], 45, [315, 134])
                dets.append(j)
                dlabels.append(lab if rng.random() < 0.8
                               else rng.integers(0, n_cls))
        n_noise = int(rng.integers(2, 6))
        dets.extend(rand_boxes(n_noise))
        dlabels.extend(rng.integers(0, n_cls, n_noise))
        det_boxes = np.asarray(dets, np.float32)
        det_labels = np.asarray(dlabels, np.int32)
        det_scores = rng.uniform(0.05, 1.0, len(dets)).astype(np.float32)

        det_results.append((det_boxes, det_scores, det_labels))
        annotations.append({"boxes": gt, "labels": gl,
                            "ignore_boxes": ig, "ignore_labels": igl})
        ref_dets.append([
            np.concatenate([xyxy(det_boxes[det_labels == c]),
                            det_scores[det_labels == c, None]], axis=-1)
            for c in range(n_cls)
        ])
        ref_anns.append(dict(bboxes=xyxy(gt), labels=gl,
                             bboxes_ignore=xyxy(ig), labels_ignore=igl))
    return det_results, annotations, ref_dets, ref_anns


@pytest.mark.parametrize("iou_thr", [0.5, 0.75])
@pytest.mark.parametrize("seed", [0, 1])
def test_voc_map_matches_reference_eval_map(iou_thr, seed):
    """eval_voc_map == the reference's vendored eval_map (tpfp_default +
    area-AP, /root/reference/mmdet/core/evaluation/mean_ap.py:169,525) on
    identical random inputs — the evaluation analogue of the IoU
    differential harness."""
    from utils.refmods import load_reference_mean_ap, reference_available

    if not reference_available():
        pytest.skip("/root/reference not present")
    from sph_retina_tpu.engine.eval import eval_voc_map

    mean_ap = load_reference_mean_ap()
    det_results, annotations, ref_dets, ref_anns = _voc_differential_dataset(
        seed)
    ours = eval_voc_map(det_results, annotations, 4, iou_thr=iou_thr,
                        backend="naive")
    ref_map, ref_cls = mean_ap.eval_map(
        ref_dets, ref_anns, iou_thr=iou_thr, nproc=1, logger="silent")
    assert ours["mAP"] == pytest.approx(float(ref_map), abs=2e-5)
    for c in range(4):
        assert ours["per_class"][c]["num_gts"] == ref_cls[c]["num_gts"]
        assert ours["per_class"][c]["ap"] == pytest.approx(
            float(ref_cls[c]["ap"]), abs=2e-5)


def test_voc_map_11points_mode():
    """11-point AP mode matches the reference's average_precision('11points')
    on the same PR curve."""
    from utils.refmods import load_reference_mean_ap, reference_available

    if not reference_available():
        pytest.skip("/root/reference not present")
    from sph_retina_tpu.engine.eval import _voc_average_precision

    mean_ap = load_reference_mean_ap()
    rng = np.random.default_rng(3)
    recalls = np.sort(rng.uniform(0, 1, 50))
    precisions = rng.uniform(0, 1, 50)
    for mode in ("area", "11points"):
        ref = float(mean_ap.average_precision(recalls, precisions, mode))
        assert _voc_average_precision(recalls, precisions, mode) == \
            pytest.approx(ref, abs=1e-6)
