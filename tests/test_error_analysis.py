"""Error-type decomposition (coco_error_analysis.py parity).

Constructed scenario with one of each error source; the rung APs must be
monotone and each rung must forgive exactly its error.
"""

import numpy as np

from sph_retina_tpu.engine.error_analysis import (
    ERROR_TYPES,
    error_decomposition,
)


def _scenario():
    """Class 0: 3 GT. Dets (score order):
    d0 exact match; d1 offset enough to pass IoU .5 but fail .75;
    d2 sits on a class-1 GT (confusion); d3 background; GT #2 is missed.
    """
    gt_boxes = np.array([
        [100.0, 90.0, 40.0, 40.0],   # class 0, matched by d0
        [200.0, 90.0, 40.0, 40.0],   # class 0, loosely matched by d1
        [300.0, 90.0, 40.0, 40.0],   # class 0, missed (FN)
        [40.0, 90.0, 40.0, 40.0],    # class 1 (confusion target)
    ], np.float32)
    gt_labels = np.array([0, 0, 0, 1], np.int32)
    det_boxes = np.array([
        [100.0, 90.0, 40.0, 40.0],   # exact
        [206.0, 96.0, 40.0, 40.0],   # ~0.5 < IoU < 0.75
        [40.0, 90.0, 40.0, 40.0],    # on the class-1 GT
        [120.0, 20.0, 30.0, 30.0],   # background
    ], np.float32)
    # confusion (d2) and background (d3) outrank the loose TP (d1) so each
    # dents precision at a recall level a later TP reaches — trailing FPs
    # would be hidden by the interpolated-AP envelope
    det_scores = np.array([0.9, 0.7, 0.8, 0.85], np.float32)
    det_labels = np.zeros(4, np.int32)
    return ([(det_boxes, det_scores, det_labels)],
            [{"boxes": gt_boxes, "labels": gt_labels}])


def test_ladder_is_monotone_and_attributes_errors():
    dets, anns = _scenario()
    out = error_decomposition(dets, anns, num_classes=2,
                              backend="sph2pob_efficient")
    assert out["valid"][0] and out["valid"][1]  # both classes have GT

    ap = out["ap"][:, 0]
    names = dict(zip(ERROR_TYPES, ap))
    # monotone ladder
    assert all(ap[i] <= ap[i + 1] + 1e-9 for i in range(len(ap) - 1))
    # C75 only credits the exact det; C50 adds the offset one
    assert names["C50"] > names["C75"]
    # Loc at IoU .1 matches both but not the confusion/background dets
    assert names["Loc"] >= names["C50"]
    # Oth forgives the class confusion -> strictly better than Loc
    assert names["Oth"] > names["Loc"]
    # BG forgives the background FP -> better still, but recall-capped < 1
    assert names["BG"] > names["Oth"]
    assert names["BG"] < 1.0
    # FN rung is exactly 1
    assert names["FN"] == 1.0


def test_class_with_gt_but_no_dets_is_valid_all_zero():
    dets, anns = _scenario()
    out = error_decomposition(dets, anns, num_classes=2,
                              backend="sph2pob_efficient")
    # class 1 has one GT and no class-1 dets: valid, curves 0 except FN
    assert out["valid"][1]
    assert out["ap"][:5, 1].max() == 0.0
    assert out["ap"][5, 1] == 1.0
