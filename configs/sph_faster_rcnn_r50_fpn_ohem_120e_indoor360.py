# Faster R-CNN with online hard example mining in the RoI sampler.
# Preset parity with /root/reference/configs/faster_rcnn/
# faster_rcnn_r50_fpn_ohem_1x_coco.py (train_cfg.rcnn.sampler OHEMSampler):
# candidates are ranked by per-roi loss from a no-grad head forward and the
# hardest positives/negatives are kept (models/faster_rcnn.py:sample_rois).
_base_ = ["sph_faster_rcnn_r50_fpn_120e_indoor360.py"]

train_cfg = dict(sampler=dict(type="OHEMSampler"))
