"""Config system: _base_ composition, CLI overrides, ${key} interpolation
(reference mmcv Config + mmdet replace_cfg_vals semantics)."""

from sph_retina_tpu.utils.config import (
    apply_overrides,
    load_config,
    replace_cfg_vals,
)
from sph_retina_tpu.utils.env import collect_env, env_string


def test_base_composition_child_wins(tmp_path):
    (tmp_path / "base.py").write_text(
        "model = dict(type='SphRetinaNet', num_classes=3)\n"
        "optimizer = dict(lr=0.01)\n")
    (tmp_path / "leaf.py").write_text(
        "_base_ = ['base.py']\n"
        "model = dict(num_classes=7)\n"
        "img_size = (64, 128)\n")
    cfg = load_config(str(tmp_path / "leaf.py"))
    assert cfg["model"] == {"type": "SphRetinaNet", "num_classes": 7}
    assert cfg["optimizer"]["lr"] == 0.01 and cfg["img_size"] == (64, 128)


def test_cfg_options_literal_parsing():
    cfg = apply_overrides({"a": {"b": 1}}, ["a.b=2", "a.c=0.5", "d=[1,2]",
                                            "e=text"])
    assert cfg == {"a": {"b": 2, "c": 0.5}, "d": [1, 2], "e": "text"}


def test_replace_cfg_vals_interpolation(tmp_path):
    """${key} references resolve against the merged config; a whole-value
    reference keeps the referenced type (replace_cfg_vals parity)."""
    (tmp_path / "c.py").write_text(
        "data_root = '/data/360indoor'\n"
        "num = 37\n"
        "data = dict(train=dict(ann_file='${data_root}/train.json'),\n"
        "            classes='${num}')\n")
    cfg = load_config(str(tmp_path / "c.py"))
    assert cfg["data"]["train"]["ann_file"] == "/data/360indoor/train.json"
    assert cfg["data"]["classes"] == 37  # whole-value ref keeps int type

    plain = replace_cfg_vals({"x": 1, "y": "${x}", "z": "v${x}w"})
    assert plain["y"] == 1 and plain["z"] == "v1w"


def test_collect_env_reports_jax():
    info = collect_env()
    assert "jax" in info and "python" in info
    assert "jax:" in env_string(info)


def test_all_shipped_configs_build():
    """Config sanity over every shipped preset (reference
    tests/test_runtime/test_config.py behavior): each leaf config must
    load, resolve to a model family, build the model + detector config,
    generate anchors, and build an optimizer."""
    import glob
    import os

    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.zoo import get_family

    repo = os.path.join(os.path.dirname(__file__), "..")
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.py")))
    assert len(paths) >= 8
    for path in paths:
        cfg = load_config(path)
        family = get_family(cfg)
        model, det = family.build(cfg)
        assert det.num_classes == cfg["model"]["num_classes"], path
        if hasattr(det, "flat_anchors"):  # anchor-based families
            anchors = det.flat_anchors()
            assert anchors.ndim == 2 and anchors.shape[0] > 0, path
            bv = cfg["model"].get("box_version", 4)
            assert anchors.shape[1] == bv, path
        build_tx(cfg, 10)


def test_frozen_stages_drives_optimizer_mask():
    """model.backbone.frozen_stages selects the frozen parameter subtrees
    (mmdet ResNet._freeze_stages semantics): 1 freezes stem+layer1 (the
    reference default), -1 freezes nothing, 2 also freezes layer2. An
    explicit cfg['frozen_prefixes'] still wins."""
    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.builder import build_tx

    params = {"backbone": {"conv1": {"w": jnp.ones(3)},
                           "bn1": {"scale": jnp.ones(3)},
                           "layer1": {"w": jnp.ones(3)},
                           "layer2": {"w": jnp.ones(3)}},
              "bbox_head": {"w": jnp.ones(3)}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def updated(cfg):
        tx = build_tx(cfg, 10)
        upd, _ = tx.update(grads, tx.init(params), params)
        return {path: bool(jnp.any(leaf != 0)) for path, leaf in
                [("/".join(str(k.key) for k in p), v) for p, v in
                 jax.tree_util.tree_flatten_with_path(upd)[0]]}

    base = dict(optimizer=dict(lr=0.01), lr_config=dict(warmup_iters=0))
    u = updated({**base, "model": dict(backbone=dict(frozen_stages=1))})
    assert not u["backbone/conv1/w"] and not u["backbone/bn1/scale"]
    assert not u["backbone/layer1/w"]
    assert u["backbone/layer2/w"] and u["bbox_head/w"]
    # default (no backbone cfg) matches the reference's frozen_stages=1
    assert updated({**base, "model": {}}) == u
    u2 = updated({**base, "model": dict(backbone=dict(frozen_stages=-1))})
    assert all(u2.values())
    u3 = updated({**base, "model": dict(backbone=dict(frozen_stages=2))})
    assert not u3["backbone/layer2/w"] and u3["bbox_head/w"]
    u4 = updated({**base, "model": dict(backbone=dict(frozen_stages=1)),
                  "frozen_prefixes": ("bbox_head",)})
    assert not u4["bbox_head/w"] and u4["backbone/layer1/w"]


def test_kent_rotated_preset_trains():
    """The kent_rotated preset (5-dof head, sph2pob_efficient assignment,
    rotated NMS) runs one train step at a tiny size."""
    import os

    import jax
    import jax.numpy as jnp

    from sph_retina_tpu.engine.builder import build_tx
    from sph_retina_tpu.engine.train import TrainState
    from sph_retina_tpu.engine.zoo import get_family, make_generic_train_step
    from sph_retina_tpu.geometry import generate_boxes

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(
        repo, "configs",
        "sph_kent_rotated_retinanet_r50_fpn_120e_indoor360.py"))
    cfg["img_size"] = (64, 128)
    cfg["model"]["backbone"] = {"depth": 18}
    cfg["bf16"] = False
    family = get_family(cfg)
    model, det = family.build(cfg)
    tx = build_tx(cfg, 10)
    B, G = 2, 4
    images = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 128, 3))
    v0 = family.init(model, jax.random.PRNGKey(0), images[:1])
    state = TrainState(jnp.zeros((), jnp.int32), v0["params"],
                       v0.get("batch_stats", {}), tx.init(v0["params"]))
    batch = {
        "images": images,
        "gt_boxes": jnp.stack([jnp.asarray(generate_boxes(G, 5, seed=i))
                               for i in range(B)]),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_mask": jnp.ones((B, G), bool),
    }
    step = jax.jit(make_generic_train_step(family, model, det, tx))
    state2, metrics = step(state, batch)
    assert jnp.isfinite(metrics["loss"])
    assert int(state2.step) == 1


def test_x101_config_threads_resnext_backbone():
    """backbone groups/base_width reach the model (ResNeXt support)."""
    import os

    from sph_retina_tpu.engine.zoo import get_family

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(
        repo, "configs", "sph_retinanet_x101_32x4d_fpn_120e_indoor360.py"))
    model, _ = get_family(cfg).build(cfg)
    assert (model.depth, model.groups, model.base_width) == (101, 32, 4)


def test_faster_rcnn_test_cfg_nms_threading():
    """test_cfg nms keys must reach FasterRCNNConfig (regression: the
    iou_threshold / score_thr / max_per_img keys were silently dropped)."""
    from sph_retina_tpu.engine.zoo import get_family

    cfg = dict(
        model=dict(type="SphFasterRCNN", num_classes=3,
                   backbone=dict(depth=18)),
        img_size=(64, 128), bf16=False,
        test_cfg=dict(score_thr=0.11, max_per_img=42,
                      nms=dict(type="soft_nms", iou_threshold=0.31,
                               method="gaussian", sigma=0.7)),
    )
    family = get_family(cfg)
    _, det_cfg = family.build(cfg)
    assert det_cfg.nms_iou_thr == 0.31
    assert det_cfg.score_thr == 0.11
    assert det_cfg.max_per_img == 42
    assert det_cfg.nms_type == "soft_nms"
    assert det_cfg.soft_method == "gaussian"
    assert det_cfg.soft_sigma == 0.7


def test_base_merge_delete_semantics(tmp_path):
    """mmcv Config parity: _delete_=True replaces an inherited dict instead
    of merging (so swapping loss_bbox.type drops the parent's kwargs)."""
    (tmp_path / "base.py").write_text(
        "model = dict(loss_bbox=dict(type='Sph2PobIoULoss', mode='iou'),\n"
        "             depth=50)\n")
    (tmp_path / "leaf.py").write_text(
        "_base_ = ['base.py']\n"
        "model = dict(loss_bbox=dict(_delete_=True, type='SphL1Loss'))\n")
    cfg = load_config(str(tmp_path / "leaf.py"))
    assert cfg["model"]["loss_bbox"] == {"type": "SphL1Loss"}
    assert cfg["model"]["depth"] == 50  # siblings still merge


def test_reference_style_model_dict_builds():
    """A model dict carrying the reference's registry `type` keys and
    backend spellings builds without edits (config-port path)."""
    from sph_retina_tpu.engine.builder import build_detector_config

    cfg = {
        "model": {
            "num_classes": 5,
            "anchor_generator": {
                "type": "SphAnchorGenerator",
                "box_formator": "sph2pix",
                "octave_base_scale": 4,
                "scales_per_octave": 3,
                "ratios": [0.5, 1.0, 2.0],
                "strides": [8, 16, 32, 64, 128],
            },
            "bbox_coder": {"type": "DeltaXYWHSphBBoxCoder",
                           "target_means": [0.0] * 4,
                           "target_stds": [1.0] * 4},
        },
        "train_cfg": {"assigner": {
            "type": "MaxIoUAssigner", "pos_iou_thr": 0.5,
            "neg_iou_thr": 0.4, "min_pos_iou": 0,
            "iou_calculator": {"type": "SphOverlaps2D"},
            "backend": "sph2pob_efficient_iou"}},
        "test_cfg": {"iou_calculator": "naive_iou"},
        "img_size": (64, 128),
    }
    det = build_detector_config(cfg)
    assert det.assign_backend == "sph2pob_efficient_iou"
    assert det.flat_anchors().shape[1] == 4


def test_delete_false_is_stripped(tmp_path):
    """mmcv pops _delete_ whatever its value; _delete_=False merges
    normally but the marker must not leak to consumers."""
    (tmp_path / "base.py").write_text(
        "model = dict(loss_bbox=dict(type='Sph2PobIoULoss', mode='iou'))\n")
    (tmp_path / "leaf.py").write_text(
        "_base_ = ['base.py']\n"
        "model = dict(loss_bbox=dict(_delete_=False, loss_weight=2.0))\n")
    cfg = load_config(str(tmp_path / "leaf.py"))
    assert cfg["model"]["loss_bbox"] == {
        "type": "Sph2PobIoULoss", "mode": "iou", "loss_weight": 2.0}


def test_pandora_preset_unbiased_nms_predicts():
    """The PANDORA preset evaluates with the exact unbiased-IoU NMS
    (reference pandora leaf, sph_retinanet_r50_fpn_120e_pandora.py:33);
    the predict path must compile and produce finite scores."""
    import os

    import jax
    import numpy as np

    from sph_retina_tpu.engine.zoo import get_family

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(os.path.join(
        repo, "configs", "sph_retinanet_r50_fpn_120e_pandora.py"))
    assert cfg["model"]["num_classes"] == 47
    assert cfg["model"].get("box_version", 4) == 4  # BFoV, like the reference
    cfg["img_size"] = (64, 128)
    cfg["model"]["backbone"] = {"depth": 18}
    cfg["bf16"] = False
    cfg["test_cfg"]["nms_pre"] = 64  # keep the (k, k) oracle matrix tiny on CPU
    cfg["test_cfg"]["max_per_img"] = 10
    fam = get_family(cfg)
    model, det = fam.build(cfg)
    assert det.nms_backend == "unbiased_iou"
    imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 128, 3))
    v = fam.init(model, jax.random.PRNGKey(0), imgs)
    out = fam.predict_fn(model, det)(v, imgs)
    assert out.boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(out.scores)).all()
