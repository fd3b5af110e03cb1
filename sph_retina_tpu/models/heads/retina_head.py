"""RetinaNet head with ``box_version``-wide regression.

Reference: sphdet/models/heads/sph_retina_head.py:11-20 (RetinaHead whose
reg conv emits A * box_version channels) on mmdet RetinaHead (4 stacked 3x3
convs per tower, focal-init cls bias). The fork's ``KentRetinaHead`` is a
byte-identical copy under a second registry name
(kent_retina_head.py:11) — covered by this class with ``box_version=5`` plus
the Kent coder/IoU configured at the detector level.

Outputs are returned flattened per level as (B, H*W*A, C) — the layout every
downstream consumer (loss, decode) wants; no NCHW permutes anywhere.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SphRetinaHead(nn.Module):
    num_classes: int
    box_version: int = 4
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_priors: int = 9
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: tuple of (B, H, W, C) levels -> (cls_scores, bbox_preds),
        each a list of (B, H*W*A, num_classes | box_version) fp32 arrays."""
        cls_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        # focal-loss prior: background logit bias so initial p ~ 0.01
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        retina_cls = nn.Conv(
            self.num_base_priors * self.num_classes, (3, 3), padding=1,
            dtype=self.dtype, bias_init=bias_init, name="retina_cls")
        retina_reg = nn.Conv(
            self.num_base_priors * self.box_version, (3, 3), padding=1,
            dtype=self.dtype, name="retina_reg")

        cls_scores, bbox_preds = [], []
        for x in feats:
            cls_feat, reg_feat = x, x
            for conv in cls_convs:
                cls_feat = nn.relu(conv(cls_feat))
            for conv in reg_convs:
                reg_feat = nn.relu(conv(reg_feat))
            b, h, w, _ = x.shape
            cls_out = retina_cls(cls_feat).astype(jnp.float32)
            reg_out = retina_reg(reg_feat).astype(jnp.float32)
            cls_scores.append(cls_out.reshape(b, h * w * self.num_base_priors,
                                              self.num_classes))
            bbox_preds.append(reg_out.reshape(b, h * w * self.num_base_priors,
                                              self.box_version))
        return cls_scores, bbox_preds
