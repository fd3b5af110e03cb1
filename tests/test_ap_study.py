"""AP-parity study machinery (tools/ap_study.py).

The full study (500-image sphere-bench, 3 variants x 24 epochs, TPU) is run
offline and its report tracked at the repo root; CI checks two things:

1. the pipeline end-to-end in quick mode — one variant, one epoch, tiny
   shapes — produces a well-formed report with stratified metrics;
2. the *published* report still claims the reference paper's orderings
   (Sph2Pob-CIoU > L1; sph2pob assignment > sph assignment,
   /root/reference/README.md:36-45,57-58), so a regenerated study that
   loses the directional result fails CI rather than landing silently.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quick_study_single_variant(tmp_path):
    from ap_study import run_study

    report = run_study(
        data_root=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"),
        seeds=[0],
        max_epochs=1,
        quick=True,
        variants=[("ciou", [])],
    )
    v = report["variants"]["ciou"]
    s = v["seeds"]["0"]
    assert set(s) >= {"AP50", "mAP", "AP75", "n_images", "strata"}
    assert s["n_images"] == 12
    assert 0.0 <= v["AP50_mean"] <= 1.0
    # every stratum present in the 12-image val split is scored
    assert s["strata"] and all(
        set(m) == {"AP50", "mAP", "n_images"} for m in s["strata"].values())
    assert os.path.exists(tmp_path / "out" / "report.json")
    assert os.path.exists(tmp_path / "out" / "AP_STUDY.md")


def test_published_report_orderings_hold():
    """Regression-gate the claims the published sphere-bench study makes
    (see work_dirs/ap_study/ROOT_CAUSE.md): a regenerated report that
    loses a published finding fails CI instead of landing silently.

    Round-5 measured findings (5 seeds on the assignment axis):
    - the EXACT unbiased oracle as the training assigner (the densest
      assignment, 222 pos/img) trains consistently WORSE than every
      approximation: its mean sits far below ciou's, and it loses the
      paired per-seed comparison against ciou on (almost) every shared
      seed — the marginal-positive-toxicity result;
    - the approximations (sph2pob / sph / fov) are statistically tied at
      this benchmark scale: per-seed spread ~0.2 AP50 dwarfs their mean
      differences (the round-4 single-seed orderings were seed draw) —
      consistent with the reference paper's real-data near-tie;
    - FCOS: decoded Sph2Pob-CIoU beats the L1 baseline (AP50 and mAP);
    - every detector family trains to a working detector (AP50 > 0.35).
    """
    path = os.path.join(REPO, "work_dirs", "ap_study", "report.json")
    if not os.path.exists(path):
        pytest.skip("full study report not published yet")
    with open(path) as f:
        report = json.load(f)
    v = report["families"]["retinanet"]["variants"]
    if "assign_unbiased" in v:
        ub, ciou = v["assign_unbiased"], v["ciou"]
        assert ub["AP50_mean"] < 0.6 * ciou["AP50_mean"], (
            ub["AP50_mean"], ciou["AP50_mean"])
        shared = set(ub["seeds"]) & set(ciou["seeds"])
        wins = sum(ub["seeds"][s]["AP50"] < ciou["seeds"][s]["AP50"]
                   for s in shared if "AP50" in ub["seeds"][s]
                   and "AP50" in ciou["seeds"][s])
        assert wins >= max(1, len(shared) - 1), (wins, len(shared))
    fams = report["families"]
    fcos = fams["fcos"]
    assert fcos["orderings"]["ciou_gt_l1"], fcos["variants"]
    assert (fcos["variants"]["ciou"]["mAP_mean"]
            > fcos["variants"]["l1"]["mAP_mean"])
    for fam, fr in fams.items():
        best = max(v["AP50_mean"] for v in fr["variants"].values()
                   if v.get("AP50_mean") is not None)
        assert best > 0.35, (fam, fr["variants"])


def test_merge_reports_unions_seeds_and_recomputes():
    from ap_study import merge_reports

    def mk(seed_vals, overrides=()):
        return {"overrides": list(overrides),
                "seeds": {str(s): {"AP50": v, "mAP": v / 2}
                          for s, v in seed_vals.items()},
                "AP50_mean": 0.0, "mAP_mean": 0.0}

    base = {
        "base_config": "cfg.py",
        "variants": {"l1": mk({0: 0.5}), "ciou": mk({0: 0.45})},
        "orderings": {"ciou_gt_l1": False},
        "seeds": [0],
    }
    new = {
        "base_config": "cfg.py",
        "variants": {"l1": mk({1: 0.2, 2: 0.2}),
                     "ciou": mk({1: 0.6, 2: 0.6})},
        "families": {"retinanet": {
            "base_config": "cfg.py",
            "variants": {"l1": mk({1: 0.2, 2: 0.2}),
                         "ciou": mk({1: 0.6, 2: 0.6})},
            "orderings": {}}},
        "seeds": [1, 2],
    }
    merged = merge_reports(base, new)
    v = merged["families"]["retinanet"]["variants"]
    assert set(v["l1"]["seeds"]) == {"0", "1", "2"}
    assert v["l1"]["AP50_mean"] == pytest.approx((0.5 + 0.2 + 0.2) / 3)
    assert v["ciou"]["AP50_mean"] == pytest.approx((0.45 + 0.6 + 0.6) / 3)
    # orderings recomputed over the union: ciou mean 0.55 > l1 mean 0.30
    assert merged["families"]["retinanet"]["orderings"]["ciou_gt_l1"]
    assert merged["orderings"]["ciou_gt_l1"]
    assert merged["seeds"] == [0, 1, 2]
    # top-level mirror points at the merged primary family
    assert merged["variants"] is merged["families"]["retinanet"]["variants"]
