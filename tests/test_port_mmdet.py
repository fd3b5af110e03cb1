"""Numerical proof of the reference-checkpoint (mmdet-layout) port.

Builds torch modules with the exact mmdet RetinaNet module tree and key
naming (backbone.layer{s}.{b}.*, neck.lateral_convs/fpn_convs.{i}.conv,
bbox_head.{cls,reg}_convs.{i}.conv + retina_cls/retina_reg — the layout of
/root/reference/mmdet/models/ checkpoints), randomizes every weight and BN
statistic, ports with ``port_mmdet_retinanet``, and asserts the full Flax
SphRetinaNet forward matches the torch eval forward per level.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sph_retina_tpu.models import SphRetinaNet, port_mmdet_retinanet  # noqa: E402


class BasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = tF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return tF.relu(out + identity)


class MMDetResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        for s, (planes, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            setattr(self, f"layer{s + 1}", self._make(planes, 2, stride))

    def _make(self, planes, blocks, stride):
        down = None
        if stride != 1 or self.inplanes != planes:
            down = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        layers = [BasicBlock(self.inplanes, planes, stride, down)]
        self.inplanes = planes
        layers.append(BasicBlock(planes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


class ConvModule(tnn.Module):
    """mmcv ConvModule ('.conv' child) as appearing in FPN/head keys."""

    def __init__(self, cin, cout, k, stride=1, pad=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, pad)

    def forward(self, x):
        return self.conv(x)


class MMDetFPN(tnn.Module):
    """mmdet FPN, start_level=1, num_outs=5, add_extra_convs='on_input'."""

    def __init__(self, in_channels=(64, 128, 256, 512), out_channels=64):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [ConvModule(c, out_channels, 1) for c in in_channels[1:]])
        self.fpn_convs = tnn.ModuleList(
            [ConvModule(out_channels, out_channels, 3, 1, 1)
             for _ in in_channels[1:]])
        self.fpn_convs.append(
            ConvModule(in_channels[-1], out_channels, 3, 2, 1))
        self.fpn_convs.append(ConvModule(out_channels, out_channels, 3, 2, 1))

    def forward(self, inputs):
        laterals = [l(inputs[i + 1])
                    for i, l in enumerate(self.lateral_convs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + tF.interpolate(
                laterals[i], scale_factor=2, mode="nearest")
        outs = [self.fpn_convs[i](laterals[i]) for i in range(len(laterals))]
        outs.append(self.fpn_convs[3](inputs[-1]))
        outs.append(self.fpn_convs[4](outs[-1]))
        return outs


class MMDetRetinaHead(tnn.Module):
    def __init__(self, num_classes, box_version, channels=64, stacked=4,
                 anchors=9):
        super().__init__()
        self.nc, self.bv, self.A = num_classes, box_version, anchors
        self.cls_convs = tnn.ModuleList(
            [ConvModule(channels, channels, 3, 1, 1) for _ in range(stacked)])
        self.reg_convs = tnn.ModuleList(
            [ConvModule(channels, channels, 3, 1, 1) for _ in range(stacked)])
        self.retina_cls = tnn.Conv2d(channels, anchors * num_classes, 3, 1, 1)
        self.retina_reg = tnn.Conv2d(channels, anchors * box_version, 3, 1, 1)

    def forward(self, feats):
        cls_out, reg_out = [], []
        for x in feats:
            c, r = x, x
            for m in self.cls_convs:
                c = tF.relu(m(c))
            for m in self.reg_convs:
                r = tF.relu(m(r))
            b, _, h, w = x.shape
            cls_out.append(self.retina_cls(c).permute(0, 2, 3, 1)
                           .reshape(b, h * w * self.A, self.nc))
            reg_out.append(self.retina_reg(r).permute(0, 2, 3, 1)
                           .reshape(b, h * w * self.A, self.bv))
        return cls_out, reg_out


class MMDetRetinaNet(tnn.Module):
    def __init__(self, num_classes=3, box_version=4):
        super().__init__()
        self.backbone = MMDetResNet18()
        self.neck = MMDetFPN()
        self.bbox_head = MMDetRetinaHead(num_classes, box_version)

    def forward(self, x):
        return self.bbox_head(self.neck(self.backbone(x)))


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=g) * 0.5)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=g) + 0.5)


@pytest.mark.parametrize("box_version", [4, 5])
def test_mmdet_retinanet_port_numerical(box_version):
    tm = MMDetRetinaNet(num_classes=3, box_version=box_version).eval()
    _randomize(tm, seed=box_version)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    ported = port_mmdet_retinanet(sd, depth=18)
    model = SphRetinaNet(num_classes=3, box_version=box_version, depth=18,
                         feat_channels=64, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(1, 32, 64, 3)).astype(
        np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # ported tree must be structurally identical to a fresh init
    assert (jax.tree_util.tree_structure(init_vars["params"])
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, ported["params"])))

    cls_j, reg_j = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x))
    with torch.no_grad():
        cls_t, reg_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(cls_j) == len(cls_t) == 5
    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(cls_j[lvl]),
                                   cls_t[lvl].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(reg_j[lvl]),
                                   reg_t[lvl].numpy(), atol=2e-4)


def test_convert_reference_checkpoint_cli(tmp_path):
    import os
    import subprocess
    import sys

    tm = MMDetRetinaNet(num_classes=2).eval()
    _randomize(tm, seed=7)
    pth = str(tmp_path / "ref.pth")
    torch.save({"meta": {"epoch": 12}, "state_dict": tm.state_dict()}, pth)
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    p = subprocess.run(
        [sys.executable, "tools/convert_reference_checkpoint.py", pth,
         str(tmp_path / "out.npz"), "--depth", "18"],
        cwd=repo, capture_output=True, text=True,
        env={**os.environ, "XLA_FLAGS": ""})
    assert p.returncode == 0, p.stdout + p.stderr
    out = p.stdout.strip().split("-> ")[-1]
    assert os.path.exists(out)

    from sph_retina_tpu.utils.publish import load_published

    params, stats, meta = load_published(out)
    assert meta["epoch"] == 12
    assert "retina_cls" in params["bbox_head"]
    np.testing.assert_allclose(
        params["bbox_head"]["retina_cls"]["bias"],
        tm.bbox_head.retina_cls.bias.detach().numpy())
