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
