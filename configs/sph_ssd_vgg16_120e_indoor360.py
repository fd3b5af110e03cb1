# SSD-VGG16 BFoV on 360-Indoor (head parity with sphdet/models/heads/sph_ssd_head.py)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]
model = dict(type="SphSSD", num_classes=37)
optimizer = dict(lr=2e-3)
