# RetinaNet BFoV on PANDORA (47 classes) — parity preset with
# /root/reference/configs/retinanet/sph_retinanet_r50_fpn_120e_pandora.py
# (4-dof boxes there too; that leaf assigns with sph2pob_efficient and
# evaluates with the exact unbiased-IoU NMS, pandora.py:29-33 — safe here
# since the (N,N,40,40) dedup tensor was removed from the pairwise path).
_base_ = ["_base_/sph_retinanet_r50_fpn.py"]

model = dict(num_classes=47)
test_cfg = dict(iou_calculator="unbiased_iou")
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
