# RetinaNet BFoV on 360-Indoor (37 classes) — parity preset with
# /root/reference/configs/retinanet/sph_retinanet_r50_fpn_120e_indoor360.py
# (that leaf overrides the base's L1 to the decoded-box Sph2Pob IoU loss,
# assigns with sph2pob_standard, and evaluates with naive-IoU NMS).
_base_ = ["_base_/sph_retinanet_r50_fpn.py"]

model = dict(
    num_classes=37,
    reg_decoded_bbox=True,
    loss_bbox=dict(type="Sph2PobIoULoss", mode="iou", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="sph2pob_standard"))
test_cfg = dict(iou_calculator="naive_iou")
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
