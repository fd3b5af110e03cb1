# RetinaNet BFoV on 360-Indoor (37 classes) — parity preset with
# /root/reference/configs/retinanet/sph_retinanet_r50_fpn_120e_indoor360.py
_base_ = ["_base_/sph_retinanet_r50_fpn.py"]

model = dict(num_classes=37)
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    max_gt=64,
    flip_ratio=0.5,
    train=dict(
        ann_file="datasets/360-Indoor/annotations/instances_train2017.json",
        img_prefix="datasets/360-Indoor/images/",
    ),
    val=dict(
        ann_file="datasets/360-Indoor/annotations/instances_val2017.json",
        img_prefix="datasets/360-Indoor/images/",
    ),
    test=dict(
        ann_file="datasets/360-Indoor/annotations/instances_val2017.json",
        img_prefix="datasets/360-Indoor/images/",
    ),
)
