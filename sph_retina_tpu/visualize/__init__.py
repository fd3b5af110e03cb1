from .sph_draw import draw_boxes, erp_box_polyline, imshow_det_bboxes
from .plots import plot_curve, plot_iou_scatter
from .camera import PerspectiveCamera

__all__ = ["draw_boxes", "erp_box_polyline", "imshow_det_bboxes",
           "plot_curve", "plot_iou_scatter", "PerspectiveCamera"]
