# Faster R-CNN BFoV on 360-Indoor (RPN + RoI parity with sph_rpn_head.py /
# sph_rcnn_head.py)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]
model = dict(type="SphFasterRCNN", num_classes=37)
