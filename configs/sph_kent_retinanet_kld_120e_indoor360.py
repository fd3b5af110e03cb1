# Kent assignment + Kent-KLD regression loss on decoded boxes — beyond the
# fork (its kent preset keeps delta-L1 regression, base_kent_retinanet_r50
# _fpn.py:45); this variant exercises the full differentiable Kent
# pipeline (kent_iou_calculator.py:155-157 kent_loss as a regression
# loss). BFoV (box_version 4) so the KLD sees the loss-bearing dofs.
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    reg_decoded_bbox=True,
    loss_bbox=dict(_delete_=True, type="KentLoss", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="kent"))
data = dict(samples_per_gpu=1)
