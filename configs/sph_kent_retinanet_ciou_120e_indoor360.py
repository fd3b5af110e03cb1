# Kent assignment + Sph2Pob CIoU regression — parity with the fork's
# kent_configs/retinanet/kent_retinanet_r50_fpn_120e_indoor360_obb_ciou_loss.py
# (Kent-KLD IoU drives assignment; the regression loss is swapped to the
# decoded-box Sph2Pob CIoU).
_base_ = ["sph_kent_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    reg_decoded_bbox=True,
    loss_bbox=dict(type="Sph2PobIoULoss", mode="ciou", loss_weight=1.0),
)
