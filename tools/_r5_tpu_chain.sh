#!/bin/bash
# Round-5 post-sweep TPU job chain (run from /root/repo).
# Each stage is bounded; failures fall through to the next stage.
set -x
cd /root/repo

# 1. stratified assignment audits (polar vs body image subsets)
timeout 1800 python tools/assign_audit.py --out work_dirs/assign_audit_polar \
  --split train --stratum polar \
  --backends sph2pob_efficient sph fov unbiased
timeout 1800 python tools/assign_audit.py --out work_dirs/assign_audit_body \
  --split train --stratum body \
  --backends sph2pob_efficient sph fov unbiased

# 2. Kent re-runs post-NaN-fix (VERDICT item 4): fork-parity assignment-only
#    arm + the gradient-through-KLD arm, 3 seeds each, merged into the
#    published report
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "."); sys.path.insert(0, "tools")
from ap_study import VARIANTS, run_study
V = dict(VARIANTS)
kent_fork = ("kent_fork", [
    "model.reg_decoded_bbox=False",
    "model.loss_bbox={'type': 'SphL1Loss', 'loss_weight': 1.0}",
    "train_cfg.assigner.backend=kent",
])
jobs = [([kent_fork], [0, 1, 2]), ([("kent", V["kent"])], [0, 1, 2])]
for variants, seeds in jobs:
    print(f"### kent sweep {[v[0] for v in variants]} seeds={seeds}",
          flush=True)
    run_study(data_root="work_dirs/sphere_bench",
              out_dir="work_dirs/ap_study", seeds=seeds, variants=variants,
              families=("retinanet",),
              merge_with="work_dirs/ap_study/report.json")
EOF

# 2b. mechanism experiment: the approximations UNDERESTIMATE IoU (audit
#     band signed err: sph -0.134, fov -0.026), so they act as implicitly
#     stricter assigners. If marginal barely-0.5 geometric positives are
#     the toxin, unbiased assignment with a raised threshold should
#     recover toward sph's AP.
timeout 7200 python - <<'EOF'
import sys
sys.path.insert(0, "."); sys.path.insert(0, "tools")
from ap_study import run_study
variants = [
    ("assign_unbiased_thr60", [
        "train_cfg.assigner.backend=unbiased",
        "train_cfg.assigner.pos_iou_thr=0.6",
        "train_cfg.assigner.neg_iou_thr=0.5",
    ]),
    ("assign_unbiased_thr65", [
        "train_cfg.assigner.backend=unbiased",
        "train_cfg.assigner.pos_iou_thr=0.65",
        "train_cfg.assigner.neg_iou_thr=0.55",
    ]),
]
run_study(data_root="work_dirs/sphere_bench", out_dir="work_dirs/ap_study",
          seeds=[0, 1, 2], variants=variants, families=("retinanet",),
          merge_with="work_dirs/ap_study/report.json")
EOF

# 3. distortion-stressed study (VERDICT item 5): 1000 train imgs, the
#    assignment axis where backends maximally disagree; 2 seeds now, more
#    merged later if time allows
timeout 28800 python - <<'EOF'
import sys
sys.path.insert(0, "."); sys.path.insert(0, "tools")
from ap_study import VARIANTS, run_study
V = dict(VARIANTS)
names = ["ciou", "assign_sph", "assign_fov", "assign_unbiased"]
variants = [(n, V[n]) for n in names]
run_study(data_root="work_dirs/sphere_bench_stress",
          out_dir="work_dirs/ap_study_stress", seeds=[0, 1],
          variants=variants, families=("retinanet",),
          dataset_gen=dict(n_train=1000, n_val=300))
EOF

# 4. MFU levers experiment (VERDICT item 7)
timeout 4000 python tools/mfu_experiment.py --out work_dirs/mfu_experiments.json

echo "R5 TPU CHAIN DONE"
