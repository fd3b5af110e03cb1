"""Pallas TPU kernels for the fused Sph2Pob-IoU hot path.

Two kernels over the componentwise pipeline in ``fused_iou.py``:

- **aligned**: N matched pairs -> (N,) IoU. Inputs are laid out as
  (D, N/128, 128) component planes so each component tile is a native
  (sublanes, 128) VPU shape; the grid walks N in chunks.
- **pairwise**: (N, D) x (M, D) -> (N, M) IoU matrix — the anchor-assignment
  workload (~100k anchors x K gt). The grid tiles (N, M); box1 components
  enter as (TN, 1) columns, box2 components as (1, TM) rows, and the whole
  pipeline broadcasts to (TN, TM) inside VMEM. Nothing N*M-sized ever
  touches HBM except the output matrix itself.

This is the TPU replacement for the reference's mmcv CUDA ``box_iou_rotated``
(/root/reference/sphdet/iou/sph_iou_api.py:79) — fused with the spherical
transform so spherical degrees go in and IoU comes out in one kernel pass.

Both wrappers fall back to interpret mode off-TPU (tests), and pad
shapes to tile multiples with masked writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_iou import fused_sph2pob_iou

_LANE = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def _pad_to(x: jax.Array, n: int, axis: int = 0, value: float = 0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# --------------------------------------------------------------------------- #
# aligned: N pairs -> (N,)
# --------------------------------------------------------------------------- #
def _aligned_kernel(b1_ref, b2_ref, out_ref, *, box_dim: int):
    b1 = [b1_ref[c] for c in range(box_dim)]  # each (S, 128)
    b2 = [b2_ref[c] for c in range(box_dim)]
    out_ref[...] = fused_sph2pob_iou(b1, b2)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _aligned_call(p1, p2, block_rows: int, interpret: bool):
    d, s, _ = p1.shape
    grid = (pl.cdiv(s, block_rows),)
    return pl.pallas_call(
        functools.partial(_aligned_kernel, box_dim=d),
        out_shape=jax.ShapeDtypeStruct((s, _LANE), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, block_rows, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_rows, _LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p1, p2)


def sph2pob_iou_aligned_tpu(
    boxes1: jax.Array,
    boxes2: jax.Array,
    *,
    block_rows: int = 32,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused aligned Sph2Pob IoU: (N, D), (N, D) degrees -> (N,) in [0, 1]."""
    if interpret is None:
        interpret = not _on_tpu()
    n, d = boxes1.shape
    chunk = block_rows * _LANE
    n_pad = pl.cdiv(max(n, 1), chunk) * chunk
    # (N, D) -> (D, S, 128) component planes. Padding value 1.0 keeps the
    # padded pairs non-degenerate (theta=phi=fov=1 deg on both sides).
    p1 = _pad_to(boxes1.astype(jnp.float32), n_pad, 0, 1.0)
    p2 = _pad_to(boxes2.astype(jnp.float32), n_pad, 0, 1.0)
    p1 = p1.T.reshape(d, n_pad // _LANE, _LANE)
    p2 = p2.T.reshape(d, n_pad // _LANE, _LANE)
    out = _aligned_call(p1, p2, block_rows, interpret)
    return out.reshape(n_pad)[:n]


# --------------------------------------------------------------------------- #
# pairwise: (N, D) x (M, D) -> (N, M)
# --------------------------------------------------------------------------- #
def _pairwise_kernel(b1_ref, b2_ref, out_ref, *, box_dim: int):
    b1 = [b1_ref[c] for c in range(box_dim)]  # each (TN, 1)
    b2 = [b2_ref[c] for c in range(box_dim)]  # each (1, TM)
    out_ref[...] = fused_sph2pob_iou(b1, b2)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def _pairwise_call(p1, p2, tile_n: int, tile_m: int, interpret: bool):
    d, n, _ = p1.shape
    m = p2.shape[2]
    grid = (pl.cdiv(n, tile_n), pl.cdiv(m, tile_m))
    return pl.pallas_call(
        functools.partial(_pairwise_kernel, box_dim=d),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile_n, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1, tile_m), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p1, p2)


def sph2pob_iou_pairwise_tpu(
    boxes1: jax.Array,
    boxes2: jax.Array,
    *,
    tile_n: int = 128,
    tile_m: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused pairwise Sph2Pob IoU matrix: (N, D) x (M, D) degrees -> (N, M)."""
    if interpret is None:
        interpret = not _on_tpu()
    n, d = boxes1.shape
    m = boxes2.shape[0]
    n_pad = pl.cdiv(max(n, 1), tile_n) * tile_n
    m_pad = pl.cdiv(max(m, 1), tile_m) * tile_m
    p1 = _pad_to(boxes1.astype(jnp.float32), n_pad, 0, 1.0)
    p2 = _pad_to(boxes2.astype(jnp.float32), m_pad, 0, 1.0)
    p1 = p1.T[:, :, None]          # (D, N, 1)
    p2 = p2.T[:, None, :]          # (D, 1, M)
    out = _pairwise_call(p1, p2, tile_n, tile_m, interpret)
    return out[:n, :m]
