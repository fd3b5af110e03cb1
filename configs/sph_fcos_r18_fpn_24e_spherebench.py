# FCOS sphere-bench ablation base (see sph_retinanet_r18_fpn_24e_spherebench
# .py). Inherits the decoded-box Sph2Pob-CIoU loss_bbox from the base; the
# ap_study "l1" variant overrides it to SphL1Loss on the decoded boxes
# (FCOS has no delta parameterization — the reference's FCOS L1 row,
# /root/reference/README.md:59, regresses box-domain coordinates).
_base_ = ["sph_retinanet_r18_fpn_24e_spherebench.py"]

model = dict(type="SphFCOS")
