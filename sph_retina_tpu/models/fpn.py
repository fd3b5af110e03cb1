"""Feature Pyramid Network neck, NHWC, Flax.

mmdet-FPN semantics for the config the reference uses
(configs/_base_/models/sph_retinanet_r50_fpn.py:14-20): ``start_level``,
``num_outs`` > inputs via stride-2 extra convs on the backbone's last input
(``add_extra_convs='on_input'``), nearest-neighbor top-down upsampling.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    add_extra_convs: str = "on_input"
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        used = inputs[self.start_level:]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(laterals[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(x)
            for i, x in enumerate(laterals)
        ]
        extra_src = {
            "on_input": jnp.asarray(inputs[-1], self.dtype),
            "on_lateral": laterals[-1],
            "on_output": outs[-1],
        }[self.add_extra_convs]
        for i in range(self.num_outs - len(outs)):
            if i > 0 and self.relu_before_extra_convs:
                extra_src = nn.relu(extra_src)
            extra_src = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=1,
                                dtype=self.dtype, name=f"extra_conv_{i}")(extra_src)
            outs.append(extra_src)
        return tuple(outs)
