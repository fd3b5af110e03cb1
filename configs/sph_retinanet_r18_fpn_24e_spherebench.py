# Sphere-bench ablation base: RetinaNet-R18 on the controlled synthetic ERP
# benchmark (tools/synth_dataset.py). This is the offline stand-in for the
# reference paper's 360-Indoor ablations (/root/reference/README.md:36-45,
# 57-58) — same detector family and loss/assigner axes, scaled for a
# single-chip study: R18 from scratch, 256x512 ERP, 24 epochs.
#
# tools/ap_study.py trains variants of this config (L1 vs Sph2Pob-CIoU loss;
# sph vs sph2pob assignment) and checks the paper's orderings reproduce.
_base_ = ["_base_/sph_retinanet_r50_fpn.py"]

model = dict(
    num_classes=12,
    backbone=dict(depth=18, frozen_stages=0),  # from scratch (zero egress)
    reg_decoded_bbox=True,
    loss_bbox=dict(type="Sph2PobIoULoss", mode="ciou", loss_weight=1.0),
)
train_cfg = dict(assigner=dict(backend="sph2pob_efficient"))
img_size = (256, 512)
optimizer = dict(lr=0.01)
lr_config = dict(step=[16, 22], warmup_iters=200, warmup_ratio=0.001)
runner = dict(max_epochs=24)
checkpoint_config = dict(interval=1000)  # study evaluates in-process at end
evaluation = None
log_config = dict(interval=20)
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    max_gt=24,
    flip_ratio=0.5,
    normalize_on_device=True,
    train=dict(
        ann_file="work_dirs/sphere_bench/annotations/instances_train.json",
        img_prefix="work_dirs/sphere_bench/images/",
    ),
    val=dict(
        ann_file="work_dirs/sphere_bench/annotations/instances_val.json",
        img_prefix="work_dirs/sphere_bench/images/",
    ),
    test=dict(
        ann_file="work_dirs/sphere_bench/annotations/instances_val.json",
        img_prefix="work_dirs/sphere_bench/images/",
    ),
)
