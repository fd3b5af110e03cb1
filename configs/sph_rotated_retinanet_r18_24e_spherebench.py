# Rotated (RBFoV, box_version=5) sphere-bench ablation base — the rotated
# counterpart of sph_retinanet_r18_fpn_24e_spherebench.py, for
# tools/ap_study.py --families rbfov --box-version 5 on an RBFoV-annotated
# sphere-bench (tools/synth_dataset.py --box-version 5, rotated great-circle
# footprints). Inherits the decoded-box Sph2Pob-CIoU loss; the sph2pob
# transform carries gamma (reference sph2pob_efficient.py:55-57).
_base_ = ["sph_retinanet_r18_fpn_24e_spherebench.py"]

model = dict(
    box_version=5,
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
    ),
)
test_cfg = dict(iou_calculator="sph2pob_efficient")  # rotated-aware NMS
