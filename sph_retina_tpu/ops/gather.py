"""TPU-friendly row selection.

Per-element gathers (``values[idx]``) are the slow path on TPU; a one-hot
matmul on the MXU is not (~30% of RetinaNet assignment time at G=16,
N=98k). Each one-hot row has exactly one nonzero and ``precision=HIGHEST``
splits f32 operands exactly, so the contraction is bit-exact vs the gather
(integer payloads stay exact in f32 up to 2**24).

Used by the assignment/target paths (models/single_stage.py, ssd.py,
fcos.py, faster_rcnn.py, boxes/assigner.py) where a small table (G gt
boxes/labels) is broadcast to ~1e5 anchors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows(values: jax.Array, idx: jax.Array) -> jax.Array:
    """``values[idx]`` for values (G, ...) and int idx (N,) -> (N, ...).

    Indices outside [0, G) match no one-hot column and yield ALL-ZERO rows —
    unlike numpy/jax gather (wrapping / clamping). Callers using a -1
    "unassigned" sentinel must pre-clip (as boxes/assigner.py does) or rely
    on the zero-row semantics explicitly.
    """
    g = values.shape[0]
    oh = (idx[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)
    flat = values.reshape(g, -1).astype(jnp.float32)
    out = jnp.einsum("ng,gd->nd", oh, flat, precision="highest",
                     preferred_element_type=jnp.float32)
    return out.reshape(idx.shape[0], *values.shape[1:]).astype(values.dtype)


def take_rows_batched(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-row selection: values (N, G, ...), idx (N,) -> (N, ...)."""
    g = values.shape[1]
    oh = (idx[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)
    flat = values.reshape(values.shape[0], g, -1).astype(jnp.float32)
    out = jnp.einsum("ng,ngd->nd", oh, flat, precision="highest",
                     preferred_element_type=jnp.float32)
    return out.reshape(idx.shape[0], *values.shape[2:]).astype(values.dtype)
