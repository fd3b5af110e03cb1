"""Pretrained-backbone porting: torch checkpoints -> detector variables.

The reference initializes its backbone from ``torchvision://resnet50``
(/root/reference/configs/_base_/models/sph_retinanet_r50_fpn.py:13) through
mmcv's checkpoint loader. Here the equivalent is: load a torch ``state_dict``
from disk (``torch`` is importable offline; only ``torch.load`` is used),
convert it with the pure-numpy porters (:func:`port_torchvision_weights` for
ResNet, :func:`port_torchvision_vgg16` for SSD-VGG), and graft the result
onto the ``backbone`` submodule of a freshly initialized detector.

Numerical parity of the porters against torch eval-mode forwards is proven in
``tests/test_weight_port.py``.
"""

from __future__ import annotations

from .resnet import port_torchvision_weights
from .vgg import port_torchvision_vgg16


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint file into a flat name -> numpy mapping.

    Unwraps the common containers (``state_dict`` / ``model`` keys, mmcv- or
    lightning-style ``backbone.`` prefixes are left to the caller's porter).
    """
    import numpy as np
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict-like mapping")
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)
            for k, v in obj.items()}


def _merge(dst: dict, src: dict, path=()):
    """Recursively overwrite dst leaves with src leaves; src must be a
    subtree of dst (shape-checked) so typos fail loudly."""
    out = dict(dst)
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"ported key {'/'.join(path + (k,))} not in model")
        if isinstance(v, dict):
            out[k] = _merge(dst[k], v, path + (k,))
        else:
            if tuple(dst[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path + (k,))}: "
                    f"model {tuple(dst[k].shape)} vs ported {tuple(v.shape)}")
            out[k] = v.astype(dst[k].dtype) if hasattr(v, "astype") else v
    return out


def load_backbone(variables: dict, path: str, arch: str = "resnet50") -> dict:
    """Return a copy of detector ``variables`` with the ``backbone``
    submodule replaced by weights ported from a torch checkpoint at ``path``.

    ``arch``: ``resnet18/34/50/101`` or ``vgg16``.
    """
    sd = load_torch_state_dict(path)
    if arch.startswith("resnet"):
        ported = port_torchvision_weights(sd, depth=int(arch[len("resnet"):]))
    elif arch == "vgg16":
        ported = port_torchvision_vgg16(sd)
    else:
        raise ValueError(f"unknown backbone arch {arch!r}")

    out = dict(variables)
    for col, tree in ported.items():  # params / batch_stats
        if col not in variables or not tree:
            continue
        col_tree = dict(variables[col])
        col_tree["backbone"] = _merge(col_tree["backbone"], tree)
        out[col] = col_tree
    return out
