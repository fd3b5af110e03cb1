# FCOS BFoV on 360-Indoor (head parity with sphdet/models/heads/sph_fcos_head.py)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]
model = dict(type="SphFCOS", num_classes=37)
