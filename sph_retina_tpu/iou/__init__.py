from .rotated import box_corners, rotated_box_intersection, rotated_box_iou
from .unbiased import unbiased_iou as unbiased_iou_elementwise
from .approx import fov_iou_aligned, sph_iou_aligned
from .kent import (
    deg2kent,
    kent_mle,
    kent_iou_elementwise,
    kent_iou_from_params,
    kent_kld,
    sph_kent_loss,
)
from .api import (
    BACKENDS,
    sph_overlaps,
    sph2pob_standard_iou,
    sph2pob_efficient_iou,
    sph2pob_legacy_iou,
    unbiased_iou,
    sph_iou,
    fov_iou,
    naive_iou,
    kent_iou,
)

__all__ = [
    "deg2kent",
    "kent_mle",
    "kent_iou_elementwise",
    "kent_iou_from_params",
    "kent_kld",
    "sph_kent_loss",
    "BACKENDS",
    "box_corners",
    "rotated_box_intersection",
    "rotated_box_iou",
    "unbiased_iou_elementwise",
    "fov_iou_aligned",
    "sph_iou_aligned",
    "sph_overlaps",
    "sph2pob_standard_iou",
    "sph2pob_efficient_iou",
    "sph2pob_legacy_iou",
    "unbiased_iou",
    "sph_iou",
    "fov_iou",
    "naive_iou",
    "kent_iou",
]
