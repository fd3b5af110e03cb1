# Base RetinaNet-R50-FPN spherical detector (parity with
# /root/reference/configs/_base_/models/sph_retinanet_r50_fpn.py)
model = dict(
    type="SphRetinaNet",
    num_classes=37,
    box_version=4,
    backbone=dict(depth=50, frozen_stages=1),
    anchor_generator=dict(
        octave_base_scale=4,
        scales_per_octave=3,
        ratios=[0.5, 1.0, 2.0],
        strides=[8, 16, 32, 64, 128],
    ),
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[1.0, 1.0, 1.0, 1.0],
    ),
    loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
                  loss_weight=1.0),
    loss_bbox=dict(type="SphL1Loss", loss_weight=1.0),
)
train_cfg = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                  backend="sph2pob_efficient"),
)
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.05,
    nms=dict(iou_threshold=0.5),
    max_per_img=100,
    iou_calculator="planar",
)
img_size = (512, 1024)
bf16 = True
optimizer = dict(lr=0.005, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35.0))
lr_config = dict(step=[80, 110], warmup_iters=500, warmup_ratio=0.001)
runner = dict(max_epochs=120)
checkpoint_config = dict(interval=25)
evaluation = dict(interval=5, metric="bbox", save_best="AP50")
log_config = dict(interval=10)
