# RetinaNet BFoV with a ResNeXt-101 32x4d backbone on 360-Indoor.
# Backbone parity with the reference's X101 presets
# (/root/reference/configs/retinanet/retinanet_x101_32x4d_fpn_1x_coco.py:
# ResNeXt depth=101, groups=32, base_width=4) applied to the spherical
# detector; torchvision resnext101_32x4d-style state dicts load through
# the same port (tests/test_weight_port.py).
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    backbone=dict(depth=101, groups=32, base_width=4),
    # Keep the base recipe (L1 loss, efficient assignment, planar NMS):
    # this preset's reference namesake is the COCO X101 config (L1Loss),
    # not the indoor360 leaf's decoded-IoU combo inherited above.
    reg_decoded_bbox=False,
    loss_bbox=dict(_delete_=True, type="SphL1Loss", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="sph2pob_efficient"))
test_cfg = dict(iou_calculator="planar")
