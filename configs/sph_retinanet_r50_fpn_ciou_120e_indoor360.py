# RetinaNet + Sph2Pob CIoU loss (the headline ablation,
# reference README.md:58: AP 11.5 / 25.7 / 8.2)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    reg_decoded_bbox=True,
    loss_bbox=dict(type="Sph2PobIoULoss", mode="ciou", loss_weight=1.0),
)
