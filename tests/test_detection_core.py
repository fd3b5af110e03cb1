"""Detection core: anchors, coders, assignment, sampling, NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from sph_retina_tpu.boxes import (
    MaxIoUAssigner,
    RandomSampler,
    SphAnchorGenerator,
    SphBBoxCoder,
    DistancePointSphBBoxCoder,
    pseudo_sample,
    planar_batched_nms,
    sph_batched_nms,
)
from sph_retina_tpu.geometry import generate_boxes, is_valid_boxes


# --------------------------------------------------------------------------- #
# anchors
# --------------------------------------------------------------------------- #
def test_planar_base_anchor_math():
    """mmdet docstring example: AnchorGenerator([16], [1.], [1.], [9]) on a
    2x2 grid (mmdet/core/anchor/anchor_generator.py:44-51)."""
    gen = SphAnchorGenerator(strides=[16], ratios=[1.0], scales=[1.0],
                             base_sizes=[9], center_offset=0.0)
    base = gen.base_anchors(0)
    np.testing.assert_allclose(base, [[-4.5, -4.5, 4.5, 4.5]])
    anchors = gen.single_level_grid_anchors((2, 2), 0)
    assert anchors.shape == (4, 4)
    # planar center of anchor 3 is (16, 16) on a 32x32 chart
    np.testing.assert_allclose(anchors[3, 0], 16 / 32 * 360.0)
    np.testing.assert_allclose(anchors[3, 1], 16 / 32 * 180.0)


def test_retina_anchor_grid():
    gen = SphAnchorGenerator(
        strides=[8, 16, 32, 64, 128],
        ratios=[0.5, 1.0, 2.0],
        octave_base_scale=4,
        scales_per_octave=3,
    )
    sizes = [(64, 128), (32, 64), (16, 32), (8, 16), (4, 8)]
    levels = gen.grid_anchors(sizes)
    assert len(levels) == 5
    assert levels[0].shape == (64 * 128 * 9, 4)
    flat = gen.flat_anchors(sizes)
    # all anchors lie in valid spherical ranges (fov may exceed for large
    # anchors near boundaries; theta/phi centers must be in range)
    a = np.asarray(flat)
    assert (a[:, 0] >= 0).all() and (a[:, 0] <= 360).all()
    assert (a[:, 1] >= 0).all() and (a[:, 1] <= 180).all()
    assert (a[:, 2] > 0).all() and (a[:, 3] > 0).all()


def test_rbfov_anchor_has_zero_gamma():
    gen = SphAnchorGenerator(strides=[8], ratios=[1.0], scales=[1.0],
                             box_version=5)
    anchors = gen.single_level_grid_anchors((4, 4), 0)
    assert anchors.shape == (16, 5)
    np.testing.assert_allclose(anchors[:, 4], 0.0)


# --------------------------------------------------------------------------- #
# coders
# --------------------------------------------------------------------------- #
def test_delta_coder_round_trip():
    for version in (4, 5):
        coder = SphBBoxCoder(box_version=version)
        anchors = jnp.asarray(generate_boxes(64, version, seed=1))
        gt = jnp.asarray(generate_boxes(64, version, seed=2))
        deltas = coder.encode(anchors, gt)
        rec = coder.decode(anchors, deltas)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=2e-3)


def test_delta_coder_zero_deltas_identity():
    coder = SphBBoxCoder(box_version=4)
    anchors = jnp.asarray(generate_boxes(16, 4, seed=3))
    rec = coder.decode(anchors, jnp.zeros((16, 4)))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(anchors), atol=1e-4)


def test_delta_coder_means_stds():
    coder = SphBBoxCoder(box_version=4, target_means=(0.1, 0.1, 0.0, 0.0),
                         target_stds=(0.5, 0.5, 1.0, 1.0))
    anchors = jnp.asarray(generate_boxes(16, 4, seed=4))
    gt = jnp.asarray(generate_boxes(16, 4, seed=5))
    rec = coder.decode(anchors, coder.encode(anchors, gt))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=2e-3)


def test_decode_clamps_ranges():
    coder = SphBBoxCoder(box_version=4)
    anchors = jnp.asarray([[350.0, 170.0, 100.0, 100.0]])
    big = jnp.asarray([[5.0, 5.0, 3.0, 3.0]])  # pushes far out of range
    out = np.asarray(coder.decode(anchors, big))
    assert bool(is_valid_boxes(jnp.asarray(out)))


def test_distance_point_coder_round_trip():
    coder = DistancePointSphBBoxCoder()
    gt = jnp.asarray(generate_boxes(32, 4, seed=6))
    # points at the box centers in chart pixels
    sx, sy = 1024 / 360.0, 512 / 180.0
    pts = jnp.stack([gt[:, 0] * sx, gt[:, 1] * sy], axis=-1)
    d = coder.encode(pts, gt)
    rec = coder.decode(pts, d)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-3)


# --------------------------------------------------------------------------- #
# assignment
# --------------------------------------------------------------------------- #
def test_max_iou_assignment_semantics():
    # 3 gts (last padded/invalid), 5 anchors
    overlaps = jnp.asarray([
        [0.9, 0.3, 0.0, 0.45, 0.1],
        [0.0, 0.2, 0.6, 0.44, 0.3],
        [0.99, 0.99, 0.99, 0.99, 0.99],  # padded row must be ignored
    ])
    gt_mask = jnp.asarray([True, True, False])
    labels = jnp.asarray([7, 3, 1])
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.25, match_low_quality=True)
    res = assigner(overlaps, gt_mask, labels)
    gi = np.asarray(res.gt_inds)
    # anchor0: 0.9 >= pos -> gt1; anchor1: 0.3 < neg -> bg;
    # anchor2: 0.6 -> gt2; anchor3: 0.45 in [0.4, 0.5) -> ignore(-1),
    # but low-quality: gt0's best anchor is 0 (0.9) — taken; gt1's best is 2.
    # anchor4: 0.3 -> bg
    assert gi[0] == 1 and gi[2] == 2
    assert gi[1] == 0 and gi[4] == 0
    assert gi[3] == -1
    lab = np.asarray(res.labels)
    assert lab[0] == 7 and lab[2] == 3 and lab[1] == -1


def test_low_quality_match_rescues_gt():
    # gt1's best anchor is below pos_thr but above min_pos_iou
    overlaps = jnp.asarray([[0.45, 0.1], [0.2, 0.35]])
    assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.3)
    res = assigner(overlaps, jnp.asarray([True, True]))
    gi = np.asarray(res.gt_inds)
    assert gi[0] == 1  # rescued by gt0
    assert gi[1] == 2  # rescued by gt1


def test_no_valid_gts_all_background():
    overlaps = jnp.asarray([[0.9, 0.8]])
    res = MaxIoUAssigner()(overlaps, jnp.asarray([False]))
    assert (np.asarray(res.gt_inds) == 0).all()


def test_samplers():
    gt_inds = jnp.asarray([1, 0, 2, 0, 0, -1, 1, 0])
    s = pseudo_sample(gt_inds)
    np.testing.assert_array_equal(np.asarray(s.pos_mask),
                                  [1, 0, 1, 0, 0, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(s.neg_mask),
                                  [0, 1, 0, 1, 1, 0, 0, 1])
    sampler = RandomSampler(num=4, pos_fraction=0.5)
    rng = jax.random.PRNGKey(0)
    r = sampler(rng, gt_inds)
    assert int(jnp.sum(r.pos_mask)) <= 2
    assert int(jnp.sum(r.neg_mask)) <= 2
    assert not bool(jnp.any(r.pos_mask & r.neg_mask))


# --------------------------------------------------------------------------- #
# NMS
# --------------------------------------------------------------------------- #
def _nms_fixture():
    """Reference tests/test_nms.py:6-27 fixture: duplicates across classes."""
    boxes = jnp.asarray([
        [20, 40, 30, 30], [20, 40, 30, 30], [22, 38, 32, 28],
        [60, 60, 10, 10], [60, 60, 10, 10],
        [60, 60, 10, 10], [60, 60, 10, 10], [30, 10, 10, 10],
        [30, 45, 45, 45], [80, 20, 66, 66],
    ], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.5, 0.85, 0.75, 0.65, 0.4, 0.3])
    idxs = jnp.asarray([1, 1, 1, 1, 1, 2, 2, 2, 3, 3])
    return boxes, scores, idxs


def test_sph_nms_reference_fixture():
    boxes, scores, idxs = _nms_fixture()
    res = sph_batched_nms(boxes, scores, idxs, iou_threshold=0.5,
                          max_num=10, nms_pre=10)
    kept = sorted(np.asarray(res.inds)[np.asarray(res.valid)].tolist())
    # class 1: keep 0 (dup 1,2 suppressed), keep 3 (dup 4 suppressed)
    # class 2: keep 5 (dup 6 suppressed), keep 7
    # class 3: 8 and 9 overlap little -> both kept
    assert 0 in kept and 3 in kept and 5 in kept and 7 in kept
    assert 1 not in kept and 2 not in kept and 4 not in kept and 6 not in kept


def test_planar_nms_agrees_on_fixture():
    boxes, scores, idxs = _nms_fixture()
    res = planar_batched_nms(boxes, scores, idxs, iou_threshold=0.5,
                             max_num=10, nms_pre=10)
    kept = set(np.asarray(res.inds)[np.asarray(res.valid)].tolist())
    assert {0, 3, 5, 7}.issubset(kept)
    assert not {1, 2, 4, 6} & kept


def test_nms_class_agnostic_and_padding():
    boxes, scores, idxs = _nms_fixture()
    res = sph_batched_nms(boxes, scores, idxs, iou_threshold=0.5,
                          max_num=4, nms_pre=8, class_agnostic=True)
    assert res.boxes.shape == (4, 4)
    valid_mask = jnp.asarray([True] * 5 + [False] * 5)
    res2 = sph_batched_nms(boxes, scores, idxs, iou_threshold=0.5,
                           max_num=10, nms_pre=10, valid_mask=valid_mask)
    kept = set(np.asarray(res2.inds)[np.asarray(res2.valid)].tolist())
    assert kept <= {0, 1, 2, 3, 4}


def test_nms_scores_sorted_and_jit():
    boxes, scores, idxs = _nms_fixture()
    f = jax.jit(lambda b, s, i: sph_batched_nms(
        b, s, i, iou_threshold=0.5, max_num=6, nms_pre=10))
    res = f(boxes, scores, idxs)
    sc = np.asarray(res.scores)[np.asarray(res.valid)]
    assert (np.diff(sc) <= 1e-6).all()


def test_unbiased_nms_eval_preset_memory_bounded():
    """Eval-parity NMS preset: SphNMS(iou_calculator='unbiased_iou') at
    nms_pre=1000 (reference test pipeline, SURVEY.md §3.2). Round 1's
    unbiased path materialized an (N, N, 40, 40) dedup tensor (~6.4 GB at
    k=1000); after the restructure the peak intermediate is (N, N, 40, 8),
    so this must run comfortably. Also checks unbiased and sph2pob NMS agree
    on which boxes survive for well-separated duplicates."""
    rng = np.random.default_rng(0)
    n = 1200
    base = np.asarray(generate_boxes(40, 4, seed=3, fov_range=(15.0, 50.0)))
    boxes = base[rng.integers(0, 40, n)]
    boxes = boxes + rng.normal(0, 0.3, boxes.shape).astype(np.float32)
    boxes[:, 2:] = np.clip(boxes[:, 2:], 2.0, 170.0)
    boxes[:, 0] %= 360.0
    boxes[:, 1] = np.clip(boxes[:, 1], 1.0, 179.0)
    scores = rng.random(n).astype(np.float32)
    idxs = rng.integers(0, 5, n).astype(np.int32)

    res_u = jax.jit(
        lambda b, s, i: sph_batched_nms(
            b, s, i, iou_threshold=0.5, max_num=100, nms_pre=1000,
            backend="unbiased")
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs))
    assert int(res_u.valid.sum()) > 0
    assert np.isfinite(np.asarray(res_u.scores)).all()

    res_s = sph_batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs),
        iou_threshold=0.5, max_num=100, nms_pre=1000,
        backend="sph2pob_efficient")
    keep_u = set(np.asarray(res_u.inds)[np.asarray(res_u.valid)].tolist())
    keep_s = set(np.asarray(res_s.inds)[np.asarray(res_s.valid)].tolist())
    overlap = len(keep_u & keep_s) / max(len(keep_u | keep_s), 1)
    assert overlap > 0.7, f"unbiased vs sph2pob NMS keep-set overlap {overlap}"


def test_auto_scale_lr_linear_rule():
    """Linear scaling rule semantics (mmdet/apis/train.py:71-114)."""
    from sph_retina_tpu.engine.builder import scaled_base_lr

    cfg = {"optimizer": {"lr": 0.01},
           "data": {"samples_per_gpu": 4},
           "auto_scale_lr": {"enable": True, "base_batch_size": 16}}
    # scaling counts processes (each loads samples_per_gpu), not devices
    assert scaled_base_lr(cfg, num_processes=8) == 0.01 * 32 / 16
    assert scaled_base_lr(cfg, num_processes=4) == 0.01  # batch == base
    cfg["auto_scale_lr"]["enable"] = False
    assert scaled_base_lr(cfg, num_processes=8) == 0.01
    assert scaled_base_lr({"optimizer": {"lr": 0.02}}) == 0.02


def test_fixpoint_suppress_equals_sequential_greedy():
    """The while_loop dominance fixpoint in _greedy_suppress must equal the
    textbook sequential greedy scan on random IoU matrices, including long
    suppression chains (A kills B kills-would-have C => C survives)."""
    from sph_retina_tpu.boxes.nms import _greedy_suppress

    rng = np.random.default_rng(3)
    for trial in range(20):
        k = int(rng.integers(2, 60))
        iou = rng.uniform(0, 1, (k, k)).astype(np.float32)
        iou = np.maximum(iou, iou.T)
        valid = rng.uniform(0, 1, k) > 0.2
        thr = float(rng.uniform(0.2, 0.8))

        keep_ref = valid.copy()
        for i in range(k):
            if keep_ref[i]:
                for j in range(i + 1, k):
                    if iou[i, j] > thr:
                        keep_ref[j] = False

        got = np.asarray(_greedy_suppress(jnp.asarray(iou),
                                          jnp.asarray(valid), thr))
        np.testing.assert_array_equal(got, keep_ref, err_msg=f"trial {trial}")


def test_soft_nms_matches_sequential_reference():
    """sph_batched_soft_nms == the sequential Bodla et al. algorithm
    (pick argmax, decay overlaps, repeat) on the same IoU backend."""
    from sph_retina_tpu.boxes.nms import _pairwise_iou, sph_batched_soft_nms
    from sph_retina_tpu.geometry import generate_boxes

    rng = np.random.default_rng(7)
    for method in ("linear", "gaussian"):
        n, thr, sigma, min_score = 40, 0.3, 0.5, 1e-3
        boxes = np.asarray(generate_boxes(n, 4, seed=11))
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        idxs = rng.integers(0, 3, n).astype(np.int32)

        res = sph_batched_soft_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs),
            iou_threshold=thr, sigma=sigma, min_score=min_score,
            method=method, max_num=20, nms_pre=n,
            backend="sph2pob_efficient")

        # sequential reference on the identical (class-masked) IoU matrix,
        # in the identical top-k candidate order
        order = np.argsort(-scores, kind="stable")
        iou = np.asarray(_pairwise_iou(jnp.asarray(boxes[order]),
                                       "sph2pob_efficient"))
        same = idxs[order][:, None] == idxs[order][None, :]
        iou = np.where(same, iou, 0.0)
        np.fill_diagonal(iou, 0.0)
        live = scores[order].astype(np.float64).copy()
        picks, pick_scores = [], []
        for _ in range(20):
            j = int(np.argmax(live))
            picks.append(j)
            pick_scores.append(live[j])
            if method == "linear":
                decay = np.where(iou[j] > thr, 1.0 - iou[j], 1.0)
            else:
                decay = np.exp(-(iou[j] ** 2) / sigma)
            live *= decay
            live[j] = -np.inf

        got_scores = np.asarray(res.scores)
        want = np.asarray(pick_scores)
        keep = want > min_score
        assert np.asarray(res.valid)[: keep.sum()].all()
        np.testing.assert_allclose(got_scores[: keep.sum()], want[keep],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=method)
        np.testing.assert_array_equal(
            np.asarray(res.labels)[: keep.sum()],
            idxs[order][np.asarray(picks)][keep])


def test_soft_nms_config_threading():
    """test_cfg nms=dict(type='soft_nms') reaches the predict path."""
    import jax

    from sph_retina_tpu.engine.zoo import get_family

    cfg = {"model": {"type": "SphRetinaNet", "num_classes": 3,
                     "backbone": {"depth": 18}},
           "img_size": (64, 128), "bf16": False,
           "test_cfg": {"nms": {"type": "soft_nms", "method": "gaussian",
                                "sigma": 0.4}}}
    family = get_family(cfg)
    model, det = family.build(cfg)
    assert det.nms_type == "soft_nms"
    assert det.soft_method == "gaussian" and det.soft_sigma == 0.4
    variables = family.init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 128, 3)))
    predict = jax.jit(family.predict_fn(model, det))
    res = predict(variables, jnp.zeros((2, 64, 128, 3)))
    assert np.isfinite(np.asarray(res.scores)).all()
