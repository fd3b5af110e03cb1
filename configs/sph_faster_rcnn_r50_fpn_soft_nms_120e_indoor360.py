# Faster R-CNN with soft-NMS at test time.
# Preset parity with /root/reference/configs/faster_rcnn/
# faster_rcnn_r50_fpn_soft_nms_1x_coco.py (rcnn nms type='soft_nms'):
# overlapping detections decay in score instead of being removed
# (boxes/nms.py:sph_batched_soft_nms).
_base_ = ["sph_faster_rcnn_r50_fpn_120e_indoor360.py"]

test_cfg = dict(nms=dict(type="soft_nms", iou_threshold=0.5,
                         method="linear", min_score=1e-3))
