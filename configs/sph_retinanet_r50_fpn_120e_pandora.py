# RetinaNet RBFoV on PANDORA (47 classes) — parity preset with
# /root/reference/configs/retinanet/sph_retinanet_r50_fpn_120e_pandora_old.py
_base_ = ["_base_/sph_retinanet_r50_fpn.py"]

model = dict(
    num_classes=47,
    box_version=5,
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0, 1.0],
    ),
)
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    max_gt=64,
    flip_ratio=0.5,
    train=dict(
        ann_file="datasets/PANDORA/annotations/train.json",
        img_prefix="datasets/PANDORA/images/",
    ),
    val=dict(
        ann_file="datasets/PANDORA/annotations/test.json",
        img_prefix="datasets/PANDORA/images/",
    ),
    test=dict(
        ann_file="datasets/PANDORA/annotations/test.json",
        img_prefix="datasets/PANDORA/images/",
    ),
)
