from .boxes import (
    sph_to_unit_vec,
    unit_vec_to_sph,
    longitude_tangent,
    is_valid_boxes,
    standardize_spherical_box,
    spherical_box_area,
    generate_boxes,
)
from .sph2pob import sph2pob_standard, sph2pob_efficient, sph2pob_legacy
from .jitter import jitter_spherical_boxes, jitter_rotated_boxes

__all__ = [
    "sph_to_unit_vec",
    "unit_vec_to_sph",
    "longitude_tangent",
    "is_valid_boxes",
    "standardize_spherical_box",
    "spherical_box_area",
    "generate_boxes",
    "sph2pob_standard",
    "sph2pob_efficient",
    "sph2pob_legacy",
    "jitter_spherical_boxes",
    "jitter_rotated_boxes",
]
