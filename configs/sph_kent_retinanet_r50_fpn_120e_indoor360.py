# Kent-distribution RetinaNet variant — parity with the fork's
# kent_configs/retinanet/kent_retinanet_r50_fpn_120e_indoor360.py:
# Kent-KLD IoU for assignment + Kent KLD loss. (The fork's KentRetinaHead /
# KentCoder are byte-identical to the Sph versions; only the IoU backend and
# loss differ — SURVEY.md §7.)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    reg_decoded_bbox=True,
    loss_bbox=dict(_delete_=True, type="KentLoss", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="kent"))
data = dict(samples_per_gpu=1)  # matches the fork's kent config
