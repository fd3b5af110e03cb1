# SSD-VGG16 sphere-bench ablation base. Inherits the decoded-box
# Sph2Pob-CIoU loss_bbox + reg_decoded_bbox from the retinanet base
# (reference pattern faster_rcnn_r50_fpn_ciou_1x_coco.py:5-6); the ap_study
# "l1" variant sets reg_decoded_bbox=False, which is the stock SSD
# smooth-L1 on coder deltas (/root/reference/README.md:55 row).
_base_ = ["sph_retinanet_r18_fpn_24e_spherebench.py"]

model = dict(type="SphSSD")
optimizer = dict(lr=2e-3)  # VGG16 from scratch; the SSD300 schedule's lr
