"""Port reference (mmdet-layout) detector checkpoints to this framework.

A user of the reference trains with mmdet/sphdet and gets a torch
checkpoint ``{"meta": ..., "state_dict": {...}}`` whose keys follow the
mmdet module tree (``backbone.layer1.0.conv1.weight``,
``neck.lateral_convs.0.conv.weight``, ``bbox_head.retina_cls.weight``, ...).
This module maps such a state dict onto the Flax variable tree of
:class:`~sph_retina_tpu.models.single_stage.SphRetinaNet`, so trained
reference models carry over without retraining.

Correspondences (all verified numerically in tests/test_port_mmdet.py):

- ``backbone.*``  — mmdet's ResNet uses torchvision naming
  (/root/reference/mmdet/models/backbones/resnet.py); handled by
  :func:`~sph_retina_tpu.models.resnet.port_torchvision_weights`.
- ``neck.lateral_convs.{i}.conv`` -> ``neck/lateral_{i}``;
  ``neck.fpn_convs.{i}.conv`` -> ``neck/fpn_conv_{i}`` for the first
  ``n_laterals`` entries and ``neck/extra_conv_{i - n_laterals}`` beyond
  (mmdet appends the ``add_extra_convs`` convs to ``fpn_convs``).
- ``bbox_head.cls_convs.{i}.conv`` -> ``bbox_head/cls_conv_{i}`` (same for
  reg); ``bbox_head.retina_cls`` / ``retina_reg`` map 1:1 — both layouts
  emit (A*C)-interleaved channels and reshape to (..., A, C), so no channel
  permutation is needed (mmdet ``retina_head.py`` permute+reshape ==
  this head's reshape of NHWC output).

Kernels transpose OIHW -> HWIO; BN folds into FrozenBatchNorm params +
batch_stats. ``num_batches_tracked`` keys are ignored.
"""

from __future__ import annotations

import numpy as np

from .resnet import port_torchvision_weights

__all__ = ["port_mmdet_retinanet", "split_prefix"]


def split_prefix(state_dict: dict, prefix: str) -> dict:
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix) and not k.endswith("num_batches_tracked"):
            out[k[len(prefix):]] = v
    return out


def _conv(sd: dict, name: str) -> dict:
    entry = {"kernel": np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0)}
    if name + ".bias" in sd:
        entry["bias"] = np.asarray(sd[name + ".bias"])
    return entry


def port_mmdet_retinanet(state_dict: dict, *, depth: int = 50,
                         n_laterals: int = 3) -> dict:
    """mmdet RetinaNet/KentRetinaNet state dict -> SphRetinaNet variables.

    ``state_dict``: name -> array (torch tensors or numpy). Returns
    ``{"params": ..., "batch_stats": ...}`` shaped like
    ``SphRetinaNet.init`` output. Works for any ``box_version`` (the reg
    conv's channel count carries through unchanged).
    """
    state_dict = {k: np.asarray(getattr(v, "numpy", lambda: v)())
                  for k, v in state_dict.items()}

    bb = port_torchvision_weights(split_prefix(state_dict, "backbone."),
                                  depth=depth)
    params = {"backbone": bb["params"]}
    stats = {"backbone": bb["batch_stats"]}

    neck_sd = split_prefix(state_dict, "neck.")
    neck: dict = {}
    i = 0
    while f"lateral_convs.{i}.conv.weight" in neck_sd:
        neck[f"lateral_{i}"] = _conv(neck_sd, f"lateral_convs.{i}.conv")
        i += 1
    n_laterals = i or n_laterals
    i = 0
    while f"fpn_convs.{i}.conv.weight" in neck_sd:
        dst = (f"fpn_conv_{i}" if i < n_laterals
               else f"extra_conv_{i - n_laterals}")
        neck[dst] = _conv(neck_sd, f"fpn_convs.{i}.conv")
        i += 1
    params["neck"] = neck

    head_sd = split_prefix(state_dict, "bbox_head.")
    head: dict = {}
    for tower in ("cls", "reg"):
        i = 0
        while f"{tower}_convs.{i}.conv.weight" in head_sd:
            head[f"{tower}_conv_{i}"] = _conv(head_sd,
                                              f"{tower}_convs.{i}.conv")
            i += 1
    head["retina_cls"] = _conv(head_sd, "retina_cls")
    head["retina_reg"] = _conv(head_sd, "retina_reg")
    params["bbox_head"] = head

    return {"params": params, "batch_stats": stats}
