"""Loss families (capability parity with /root/reference/sphdet/losses).

All functional: ``loss(pred, target, weight=None, *, reduction, avg_factor,
loss_weight, **cfg)``. ``build_loss`` maps a config dict (mmdet-style
``type`` key) to a partially-applied function.
"""

from functools import partial

from .focal_loss import cross_entropy_loss, sigmoid_focal_loss
from .gaussian_loss import (
    gwd_terms,
    kfiou_terms,
    kld_terms,
    obb2gaussian,
    sph2pob_gwd_loss,
    sph2pob_kf_loss,
    sph2pob_kld_loss,
)
from .iou_loss import obb_iou_loss_terms, sph2pob_iou_loss, sph_iou_loss
from .l1_loss import (
    obb2delta,
    smooth_l1_loss,
    sph2pob_l1_loss,
    sph_l1_loss,
)
from .sph2pob_loss import sph2pob_pairs
from .utils import weight_reduce_loss

LOSSES = {
    "SphL1Loss": sph_l1_loss,
    "L1Loss": sph_l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "Sph2PobL1Loss": sph2pob_l1_loss,
    "Sph2PobIoULoss": sph2pob_iou_loss,
    "SphIoULoss": sph_iou_loss,
    "Sph2PobGDLoss": sph2pob_gwd_loss,       # loss_type selects gwd/kld
    "Sph2PobGWDLoss": sph2pob_gwd_loss,
    "Sph2PobKLDLoss": sph2pob_kld_loss,
    "Sph2PobKFLoss": sph2pob_kf_loss,
    "FocalLoss": sigmoid_focal_loss,
    "KentLoss": None,  # resolved lazily (kent subsystem import)
    "CrossEntropyLoss": cross_entropy_loss,
}


def _kent_loss(*args, **kwargs):
    from ..iou.kent import sph_kent_loss

    return sph_kent_loss(*args, **kwargs)


LOSSES["KentLoss"] = _kent_loss


def build_loss(cfg: dict):
    """mmdet-style loss config -> callable (reference configs use
    dict(type='Sph2PobIoULoss', mode='ciou', loss_weight=1.0) etc.)."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind == "Sph2PobGDLoss":
        loss_type = cfg.pop("loss_type", "gwd")
        fn = sph2pob_kld_loss if "kld" in loss_type else sph2pob_gwd_loss
    else:
        fn = LOSSES[kind]
    # translate a couple of mmdet arg names
    if "use_sigmoid" in cfg:
        cfg.pop("use_sigmoid")
    return partial(fn, **cfg)


__all__ = [
    "LOSSES",
    "build_loss",
    "cross_entropy_loss",
    "sigmoid_focal_loss",
    "gwd_terms",
    "kld_terms",
    "kfiou_terms",
    "obb2gaussian",
    "sph2pob_gwd_loss",
    "sph2pob_kld_loss",
    "sph2pob_kf_loss",
    "obb_iou_loss_terms",
    "sph2pob_iou_loss",
    "sph_iou_loss",
    "obb2delta",
    "smooth_l1_loss",
    "sph2pob_l1_loss",
    "sph_l1_loss",
    "sph2pob_pairs",
    "weight_reduce_loss",
]
