# Faster R-CNN sphere-bench ablation base. Inherits the decoded-box
# Sph2Pob-CIoU second-stage loss from the retinanet base (reference
# pattern faster_rcnn_r50_fpn_ciou_1x_coco.py:5-6); the ap_study "l1"
# variant sets reg_decoded_bbox=False = the stock delta-L1 RoI head
# (/root/reference/README.md:53 row). RPN keeps its own L1 in both.
_base_ = ["sph_retinanet_r18_fpn_24e_spherebench.py"]

model = dict(type="SphFasterRCNN")
optimizer = dict(lr=0.005)
