# Rotated (RBFoV) RetinaNet on PANDORA — parity with
# /root/reference/configs/_base_/models/sph_rotated_retinanet_r50_fpn.py
# (5-dof boxes, angle-aware coder, rotated NMS via the spherical backend).
_base_ = ["sph_retinanet_r50_fpn_120e_pandora.py"]

model = dict(
    box_version=5,
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
    ),
)
test_cfg = dict(iou_calculator="sph2pob_efficient")  # rotated-aware NMS
