# Kent-distribution RetinaNet — parity with the fork's
# kent_configs/retinanet/kent_retinanet_r50_fpn_120e_indoor360.py +
# kent_configs/_base_/models/base_kent_retinanet_r50_fpn.py: the fork
# trains with **Kent-KLD IoU for assignment only** and keeps a delta-L1
# regression loss on the (5-dof) KentCoder deltas; box_version=5.
# (The fork's KentRetinaHead / KentCoder are byte-identical to the Sph
# versions; only the IoU backend differs — SURVEY.md §7. A KentLoss
# regression variant — beyond the fork — is configs/
# sph_kent_retinanet_kld_120e_indoor360.py.)
_base_ = ["sph_retinanet_r50_fpn_120e_indoor360.py"]

model = dict(
    box_version=5,
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
    ),
    reg_decoded_bbox=False,
    loss_bbox=dict(_delete_=True, type="SphL1Loss", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="kent"))
data = dict(samples_per_gpu=1)  # matches the fork's kent config
