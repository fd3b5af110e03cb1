"""End-to-end workflow on an on-disk synthetic COCO dataset (VERDICT r1 #6).

Exercises the data layer, runner, checkpointing, and CLI the way the
reference's workflow does (mmdet/apis/train.py:236-245 auto-resume +
EvalHook + tools/test.py): train 2 epochs -> stop -> --auto-resume for 2
more (bit-exact step continuation) -> tools/test.py on the final checkpoint
matching the in-train eval.
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from utils.synthetic_coco import write_synthetic_coco  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CFG_TMPL = """\
model = dict(type="SphRetinaNet", num_classes=3, backbone=dict(depth=18))
img_size = (64, 128)
bf16 = False
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    max_gt=8,
    flip_ratio=0.5,
    train=dict(ann_file={ann!r}, img_prefix={img!r}),
    val=dict(ann_file={ann!r}, img_prefix={img!r}),
    test=dict(ann_file={ann!r}, img_prefix={img!r}),
)
optimizer = dict(lr=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35.0))
lr_config = dict(step=(100,), warmup_iters=4)
runner = dict(max_epochs=4)
evaluation = dict(interval=2)
checkpoint_config = dict(interval=2)
log_config = dict(interval=1)
frozen_prefixes = ()
"""


def _run(args, timeout=900):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode == 0, p.stdout[-4000:]
    return p.stdout


def test_checkpointer_latest_commit_order_and_fallback(tmp_path):
    """latest.txt is advanced only after the (async) orbax save is durably
    committed, and a dangling pointer (crash between commit and pointer
    update, or a hand-edited file) falls back to the newest complete
    epoch_N on disk instead of failing the resume."""
    import jax.numpy as jnp

    from sph_retina_tpu.engine.runner import Checkpointer
    from sph_retina_tpu.engine.train import TrainState

    state = TrainState(jnp.asarray(3, jnp.int32), {"w": jnp.ones((2, 2))},
                       {}, {"m": jnp.zeros((2, 2))})
    ck = Checkpointer(str(tmp_path / "ckpts"), save_best=None)
    ck.save(state, 1)
    # the pointer target must already be a committed directory
    assert os.path.isdir(ck.latest_path())
    state2 = state._replace(step=jnp.asarray(7, jnp.int32))
    ck.save(state2, 2)
    assert ck.latest_path().endswith("epoch_2")

    # dangling pointer -> newest complete epoch on disk
    with open(tmp_path / "ckpts" / "latest.txt", "w") as f:
        f.write("epoch_9")
    assert ck.latest_path().endswith("epoch_2")
    restored = ck.restore(state)
    assert int(restored.step) == 7
    # no checkpoints at all -> None
    ck2 = Checkpointer(str(tmp_path / "empty"), save_best=None)
    assert ck2.latest_path() is None


def test_train_resume_test_workflow(tmp_path):
    ann, img_dir = write_synthetic_coco(str(tmp_path / "data"), n_images=16,
                                        num_classes=3, img_size=(64, 128))
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(CFG_TMPL.format(ann=ann, img=img_dir + "/"))
    work = tmp_path / "work"

    # phase 1: 2 epochs (4 steps each), eval + checkpoint at epoch 2
    _run(["tools/train.py", str(cfg_path), "--device", "cpu",
          "--work-dir", str(work), "--max-epochs", "2", "--seed", "3"])
    assert (work / "ckpts" / "epoch_2").exists()
    lines1 = [json.loads(l) for l in
              (work / "metrics.jsonl").read_text().splitlines()]
    steps1 = [r["step"] for r in lines1 if r["prefix"] == "train"]
    assert max(steps1) == 8  # 16 imgs / batch 4 * 2 epochs

    # phase 2: resume ("crash" after epoch 2), run epochs 3-4
    out = _run(["tools/train.py", str(cfg_path), "--device", "cpu",
                "--work-dir", str(work), "--max-epochs", "4", "--seed", "3",
                "--auto-resume"])
    assert "resumed from step 8" in out  # bit-exact step continuation
    lines2 = [json.loads(l) for l in
              (work / "metrics.jsonl").read_text().splitlines()]
    steps2 = [r["step"] for r in lines2 if r["prefix"] == "train"]
    assert max(steps2) == 16
    # no step replay: the resumed run logged only steps 9..16
    assert min(s for s in steps2 if s > 8) == 9

    # learning signal: late loss well below early loss
    losses = [(r["step"], r["loss"]) for r in lines2
              if r["prefix"] == "train" and "loss" in r]
    early = np.mean([l for s, l in losses if s <= 2])
    late = np.mean([l for s, l in losses if s >= 14])
    assert late < early, (early, late)

    # eval happened at epochs 2 and 4; AP never degrades to NaN and the
    # final eval is at least as good as the first
    vals = [r for r in lines2 if r["prefix"] == "val"]
    assert len(vals) >= 2
    assert np.isfinite(vals[-1]["AP50"])
    assert vals[-1]["AP50"] >= vals[0]["AP50"] - 1e-6

    # phase 3: offline tools/test.py on the final checkpoint reproduces the
    # in-train eval exactly (same data, deterministic predict)
    out_json = tmp_path / "res.json"
    raw_npz = tmp_path / "raw.npz"
    _run(["tools/test.py", str(cfg_path), str(work / "ckpts"),
          "--device", "cpu", "--out", str(out_json),
          "--save-raw", str(raw_npz)])
    res = json.loads(out_json.read_text())
    np.testing.assert_allclose(res["AP50"], vals[-1]["AP50"], atol=1e-4)

    # phase 4: analysis tools consume the raw results
    cm_dir = tmp_path / "cm"
    out = _run(["tools/confusion_matrix.py", str(cfg_path), str(raw_npz),
                str(cm_dir)])
    assert (cm_dir / "confusion_matrix.png").exists()
    assert (cm_dir / "confusion_matrix.npy").exists()
    gal_dir = tmp_path / "gallery"
    out = _run(["tools/analyze_results.py", str(cfg_path), str(raw_npz),
                str(gal_dir), "--topk", "2"])
    assert "per-image mAP" in out
    import glob
    assert glob.glob(str(gal_dir / "good" / "*.png"))
    assert glob.glob(str(gal_dir / "bad" / "*.png"))


def test_num_class_mismatch_fails_fast(tmp_path):
    """NumClassCheckHook parity: a head/dataset class-count mismatch must
    abort before any training step (reference enables NumClassCheckHook,
    configs/retinanet/sph_retinanet_r50_fpn_120e_pandora_old.py:17)."""
    ann, img_dir = write_synthetic_coco(str(tmp_path / "data"), n_images=4,
                                        num_classes=3, img_size=(64, 128))
    cfg_path = tmp_path / "cfg.py"
    bad = CFG_TMPL.format(ann=ann, img=img_dir + "/").replace(
        "num_classes=3", "num_classes=5")
    cfg_path.write_text(bad)
    p = subprocess.run(
        [sys.executable, "tools/train.py", str(cfg_path),
         "--work-dir", str(tmp_path / "work"), "--device", "cpu",
         "--max-epochs", "1"],
        cwd=REPO, timeout=300, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode != 0
    assert "num_classes=5" in p.stdout and "3 categories" in p.stdout
