# Kent rotated (RBFoV, 5-dof) RetinaNet on 360-Indoor — parity with the
# fork's kent_configs/retinanet/kent_rotated_retinanet_r50_fpn.py +
# kent_configs/_base_/models/kent_rotated_retinanet_r50_fpn.py: 5-dof
# head/anchors/angle-aware coder, sph2pob_efficient assignment (the fork's
# kent_rotated preset overrides the Kent IoU back to sph2pob_efficient_iou),
# L1 reg loss, rotated-aware NMS.
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
train_cfg = dict(
    assigner=dict(backend="sph2pob_efficient", pos_iou_thr=0.5,
                  neg_iou_thr=0.3, min_pos_iou=0.0),
)
test_cfg = dict(iou_calculator="sph2pob_efficient")  # rotated-aware NMS
data = dict(samples_per_gpu=1, workers_per_gpu=0)  # matches the fork preset
