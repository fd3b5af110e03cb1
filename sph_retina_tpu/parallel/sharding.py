"""Multi-axis sharding: DP x spatial partitioning, plus FSDP-style states.

The reference scales by data parallelism only (SURVEY.md §2.4 —
MMDistributedDataParallel, /root/reference/mmdet/utils/util_distribution.py:40,
/root/reference/mmdet/apis/train.py:152-161); nothing in its tree shards a
model or an activation. On TPU the natural extra axes are:

- **spatial partitioning (SP)**: shard the ERP image *width* over a mesh
  axis. Convolutions over a spatially-sharded input are partitioned by
  GSPMD with automatic halo exchange over ICI, so one large panorama can be
  pushed through the backbone by several chips cooperatively — useful when
  a single 512x1024+ ERP image (batch 1-2 per chip at high resolution)
  underfills the MXU or overflows HBM. Width (longitude) is chosen over
  height because ERP width is the long axis (2:1) and stays divisible by
  the axis size through every stride-32 backbone stage.
- **FSDP-style parameter sharding (ZeRO-3)**: shard every parameter /
  optimizer-state leaf over the data axis; XLA all-gathers weights where
  they are consumed and reduce-scatters gradients. Detector-sized models
  (~36 M params) fit replicated, but sharded states make optimizer memory
  per chip O(P / n_devices), which is what lets the same runtime carry
  much larger backbones.

Everything here is declarative: callers place arrays with these specs and
the jitted train step stays unchanged — XLA inserts the collectives
(all-gather / reduce-scatter / halo exchange) from the shardings alone.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_devices: int | None = None, space: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "space") mesh over ``n_devices`` devices.

    ``space=1`` degrades to the plain DP mesh every existing caller uses
    (the trailing axis is kept so specs mentioning "space" stay valid).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    n = devices.size
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    return Mesh(devices.reshape(n // space, space),
                axis_names=(DATA_AXIS, SPACE_AXIS))


def batch_specs(batch: dict, mesh: Mesh) -> dict:
    """PartitionSpec per batch entry: leading dim over 'data'; the image
    width additionally over 'space' (images are NHWC, W = ERP longitude)."""
    spatial = SPACE_AXIS in mesh.axis_names and mesh.shape[SPACE_AXIS] > 1

    def spec(name, x):
        if name == "images" and spatial and x.ndim == 4:
            return P(DATA_AXIS, None, SPACE_AXIS, None)
        return P(DATA_AXIS, *([None] * (x.ndim - 1)))

    return {k: spec(k, v) for k, v in batch.items()}


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch: batch dim over 'data', image width over 'space'."""
    specs = batch_specs(batch, mesh)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}


def fsdp_spec(shape: tuple, axis_size: int, axis: str = DATA_AXIS) -> P:
    """Shard the last-most dimension divisible by ``axis_size``; replicate
    if none is (biases, scalars, odd-sized tables).

    Last-most, not largest: for HWIO conv kernels that picks the
    output-channel dim. Sharding the *input*-channel (contracting) dim of a
    conv kernel while the conv's input is spatially sharded over another
    mesh axis miscompiles under GSPMD (observed: loss 4.61 -> 3.1e5 on the
    8-device CPU mesh, jax 0.8.x) — out-channel sharding is exact and is
    the conventional FSDP layout anyway."""
    if axis_size <= 1:
        return P()
    for i in reversed(range(len(shape))):
        if shape[i] % axis_size == 0 and shape[i] >= axis_size:
            return P(*[axis if j == i else None for j in range(len(shape))])
    return P()


def shard_state_fsdp(state, mesh: Mesh):
    """Shard every array leaf of a TrainState (params, optimizer momenta,
    EMA shadows) over the 'data' axis, ZeRO-3 style. Scalars and
    non-divisible leaves stay replicated. The jitted train step is
    unchanged: XLA all-gathers weights at their use sites and
    reduce-scatters the gradients back to the shards."""
    axis_size = mesh.shape[DATA_AXIS]

    def put(x):
        x = jnp_asarray(x)
        spec = fsdp_spec(x.shape, axis_size) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


def jnp_asarray(x):
    import jax.numpy as jnp

    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def sharded_pairwise_overlaps(b1, b2, mesh: Mesh, backend: str = "sph2pob_efficient"):
    """Pairwise spherical IoU with the N axis sharded over the 'data' mesh.

    The O(N*M) pair matrix is the detector's long-context analogue
    (SURVEY.md §5: ~100k anchors x K GT per ERP image; the reference copes
    by CPU offload above a threshold, mmdet max_iou_assigner.py:100-111).
    Here the rows of ``b1`` are spread over the mesh and each device
    computes its (N/d, M) slab against a replicated ``b2`` — no
    collectives in the compute at all, XLA just keeps the output
    row-sharded. Rows that don't divide the axis are zero-padded and
    stripped (padded rows are valid degenerate boxes, never NaN).
    """
    import jax.numpy as jnp

    axis = mesh.shape[DATA_AXIS]
    n = b1.shape[0]
    pad = (-n) % axis
    b1p = jnp.concatenate(
        [jnp.asarray(b1),
         jnp.ones((pad, b1.shape[1]), jnp.asarray(b1).dtype)]) if pad else jnp.asarray(b1)
    b1p = jax.device_put(b1p, NamedSharding(mesh, P(DATA_AXIS, None)))
    b2r = jax.device_put(jnp.asarray(b2), NamedSharding(mesh, P()))

    out = _pairwise_jit(b1p, b2r, backend)
    return out[:n] if pad else out


@functools.partial(jax.jit, static_argnames="backend")
def _pairwise_jit(x, y, backend):
    # module-level jit: repeat calls with the same shapes/backend hit the
    # compile cache instead of re-tracing a fresh closure per call
    from ..iou.api import sph_overlaps

    return sph_overlaps(x, y, backend, is_aligned=False)
