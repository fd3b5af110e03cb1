from .fused_iou import fused_sph2pob_iou
from .pallas_iou import (
    sph2pob_iou_aligned_tpu,
    sph2pob_iou_pairwise_tpu,
)

__all__ = [
    "fused_sph2pob_iou",
    "sph2pob_iou_aligned_tpu",
    "sph2pob_iou_pairwise_tpu",
]
