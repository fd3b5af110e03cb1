"""SSD-VGG16 backbone + SSD neck (extra feature layers), NHWC Flax.

Reference topology (configs/_base_/models/ssd300.py:4-20 + mmdet SSDVGG /
SSDNeck): VGG16 conv layers through conv5_3 with ceil-mode pooling, fc6/fc7
reparameterized as dilated conv6 (3x3, dilation 6) + conv7 (1x1), outputs at
conv4_3 (L2-normalized, learnable scale 20) and conv7; the neck appends
four 2-conv extra blocks for strides up to the image size.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# VGG16: channel spec per block (conv count x channels), pool after each
_VGG16_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class L2Norm(nn.Module):
    scale_init: float = 20.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale",
                           nn.initializers.constant(self.scale_init), (c,))
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                                keepdims=True)) + 1e-10
        return (x.astype(jnp.float32) / norm * scale).astype(x.dtype)


def _ceil_pool(x, window=2, stride=2):
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % stride
    pw = (-w) % stride
    return nn.max_pool(x, (window, window), (stride, stride),
                       padding=((0, ph), (0, pw)))


class SSDVGG(nn.Module):
    """VGG16 trunk; returns (conv4_3 L2-normed, conv7)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = jnp.asarray(x, self.dtype)
        feats = []
        for b, (n_convs, ch) in enumerate(_VGG16_BLOCKS):
            for i in range(n_convs):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{b + 1}_{i + 1}")(x))
            if b == 3:
                feats.append(L2Norm(name="l2_norm")(x))  # conv4_3
            if b < 4:
                x = _ceil_pool(x)
            else:
                # pool5: 3x3 stride 1 (SSD variant, keeps resolution)
                x = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        # fc6/fc7 as convs
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            dtype=self.dtype, name="conv6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="conv7")(x))
        feats.append(x)
        return tuple(feats)


# torchvision vgg16 `features` module indices of the 13 conv layers
_TV_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def port_torchvision_vgg16(state_dict: dict) -> dict:
    """torchvision vgg16 ``features.*`` conv weights -> SSDVGG params.

    Only the 13 conv layers transfer (reference parity: mmdet's SSDVGG loads
    the VGG16 conv weights from the pretrained checkpoint while the
    fc-derived conv6/conv7 and the L2Norm scale are freshly initialized).
    Accepts a mapping name -> array (OIHW kernels); returns a partial
    ``{"params": ...}`` tree to merge over ``SSDVGG.init`` output.
    """
    import numpy as np

    params: dict = {}
    idx = iter(_TV_VGG16_CONV_IDX)
    for b, (n_convs, _) in enumerate(_VGG16_BLOCKS):
        for i in range(n_convs):
            k = next(idx)
            w = np.asarray(state_dict[f"features.{k}.weight"])
            params[f"conv{b + 1}_{i + 1}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(state_dict[f"features.{k}.bias"]),
            }
    return {"params": params}


class SSDNeck(nn.Module):
    """Extra feature blocks (ssd300.py:14-20 channel/stride spec)."""

    # All extras halve (stride 2, pad 1): the reference SSD300's pad-0
    # stride-1 last extras are an artifact of its 300x300 input; for the
    # 2:1 ERP chart the uniform halving keeps every level on a power-of-2
    # stride (8..256), which the anchor grid assumes.
    out_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    level_strides: Sequence[int] = (2, 2, 2, 2)
    level_paddings: Sequence[int] = (1, 1, 1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        outs = list(feats)
        x = feats[-1]
        for i, (ch, s, p) in enumerate(zip(self.out_channels[2:],
                                           self.level_strides,
                                           self.level_paddings)):
            x = nn.relu(nn.Conv(ch // 2, (1, 1), dtype=self.dtype,
                                name=f"extra_{i}_reduce")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), (s, s), padding=p,
                                dtype=self.dtype, name=f"extra_{i}_conv")(x))
            outs.append(x)
        return tuple(outs)
