"""ResNet backbone (torchvision-compatible topology), NHWC, Flax.

Mirrors the capability surface of the reference backbone config
(/root/reference/configs/_base_/models/sph_retinanet_r50_fpn.py:3-13 and
mmdet/models/backbones/resnet.py): depth 18/34/50/101, ``out_indices``,
frozen BN statistics during detection training (``norm_eval=True`` — BN
always runs on stored moments; affine params remain trainable and
``frozen_stages`` is enforced by an optimizer mask, see
``sph_retina_tpu.engine``), 'pytorch'-style stride placement (stride on the
3x3 conv of each bottleneck).

Weight porting: parameter names/shapes map 1:1 onto torchvision state dicts
via :func:`port_torchvision_weights` (HWIO <- OIHW transposes only), so a
torchvision://resnet50 checkpoint drops in when one is available on disk —
this environment has no network egress to download one.

TPU notes: convolutions run on the MXU in the requested ``dtype``
(bfloat16 by default for speed); parameters and BN stay fp32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored moments (norm_eval semantics)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        inv = jnp.asarray(scale / jnp.sqrt(var + 1e-5), self.dtype)
        shift = jnp.asarray(bias - mean * scale / jnp.sqrt(var + 1e-5), self.dtype)
        return x * inv + shift


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x):
        # torchvision width rule: ResNeXt widens the inner convs
        # (e.g. groups=32, base_width=4 -> width = planes*2)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = FrozenBatchNorm(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        # 'pytorch' style: stride on the 3x3
        out = nn.Conv(width, (3, 3), (self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      feature_group_count=self.groups, name="conv2")(out)
        out = FrozenBatchNorm(self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet / ResNeXt with multi-level outputs, NHWC in/out.

    ``groups``/``base_width`` select the ResNeXt variants used by the
    reference's X101 configs (mmdet ``ResNeXt(groups=32, base_width=4)``,
    torchvision ``resnext50_32x4d``/``resnext101_32x8d``/``_64x4d`` —
    bottleneck-only, same state-dict naming so the weight port applies
    unchanged)."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block = Bottleneck if block_kind == "bottleneck" else BasicBlock
        if self.remat:
            # Rematerialize each residual block on the backward pass: the
            # backbone's high-resolution activations dominate train-time HBM
            # (stage 1 of R50 at B=8 512x1024 holds ~8x256x128x256 bf16 per
            # block), and trading them for recompute buys batch headroom.
            # Parameter structure is unchanged (nn.remat is a lifted
            # transform), so checkpoints and the torchvision port apply
            # as-is.
            block = nn.remat(block)
        if block_kind != "bottleneck" and (self.groups != 1
                                           or self.base_width != 64):
            raise ValueError("groups/base_width require a bottleneck depth "
                             "(>= 50)")
        x = jnp.asarray(x, self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(stage_blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                expansion = 4 if block_kind == "bottleneck" else 1
                need_down = b == 0 and (stride != 1 or x.shape[-1] != planes * expansion)
                # keyed on block_kind, NOT `block is Bottleneck` — nn.remat
                # rebinds `block` to a wrapper class and an identity check
                # would silently drop the ResNeXt groups/base_width
                kw = {"groups": self.groups, "base_width": self.base_width} \
                    if block_kind == "bottleneck" else {}
                x = block(planes, stride if b == 0 else 1, need_down,
                          self.dtype, name=f"layer{stage + 1}_{b}", **kw)(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


def port_torchvision_weights(state_dict: dict, depth: int = 50) -> dict:
    """torchvision resnet state_dict (numpy arrays) -> flax variables.

    Accepts a mapping name -> np.ndarray (e.g. loaded via
    ``torch.load(..., map_location='cpu')`` then ``.numpy()``).
    Returns {'params': ..., 'batch_stats': ...} matching :class:`ResNet`.
    """
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(name_t, name_f):
        w = np.asarray(state_dict[name_t + ".weight"])
        put(params, name_f + ("kernel",), w.transpose(2, 3, 1, 0))

    def bn(name_t, name_f):
        put(params, name_f + ("scale",), np.asarray(state_dict[name_t + ".weight"]))
        put(params, name_f + ("bias",), np.asarray(state_dict[name_t + ".bias"]))
        put(stats, name_f + ("mean",), np.asarray(state_dict[name_t + ".running_mean"]))
        put(stats, name_f + ("var",), np.asarray(state_dict[name_t + ".running_var"]))

    conv("conv1", ("conv1",))
    bn("bn1", ("bn1",))
    _, stage_blocks = ARCH_SETTINGS[depth]
    for stage, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = (f"layer{stage + 1}_{b}",)
            n_convs = 3 if ARCH_SETTINGS[depth][0] == "bottleneck" else 2
            for i in range(1, n_convs + 1):
                conv(f"{t}.conv{i}", f + (f"conv{i}",))
                bn(f"{t}.bn{i}", f + (f"bn{i}",))
            if f"{t}.downsample.0.weight" in state_dict:
                conv(f"{t}.downsample.0", f + ("downsample_conv",))
                bn(f"{t}.downsample.1", f + ("downsample_bn",))
    return {"params": params, "batch_stats": stats}
