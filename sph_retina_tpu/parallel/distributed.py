"""Process-spanning data parallelism primitives.

Reference semantics being replaced (all torch.distributed/NCCL there):

- process-group init: mmcv ``init_dist`` driven by launcher scripts
  (/root/reference/tools/dist_train.sh:1-19, tools/train.py:90-93);
- per-rank dataset sharding: torch ``DistributedSampler`` inside
  ``build_dataloader``;
- gradient sync: implicit all-reduce in MMDistributedDataParallel
  (/root/reference/mmdet/apis/train.py:152-161);
- eval result gather: ``collect_results_cpu/gpu``
  (/root/reference/mmdet/apis/test.py:81-213).

TPU-native design: ``jax.distributed.initialize`` starts the cross-process
runtime; a single global mesh spans every device of every process; each
process hands its local slice of the global batch to
``jax.make_array_from_process_local_data`` and XLA inserts the gradient
all-reduce (ICI within a slice, DCN across slices). Everything degrades to a
no-op in the single-process case, so the same train/eval code serves both.
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed(
    launcher: str = "none",
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> tuple[int, int]:
    """Initialize the multi-process runtime; returns (process_id, n_processes).

    ``launcher='none'``: single process (no-op).
    ``launcher='jax'``: ``jax.distributed.initialize``. On TPU pods all
    arguments are auto-detected from the environment; elsewhere they come
    from the flags or the ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` (or
    ``WORLD_SIZE``) / ``PROCESS_ID`` (or ``RANK``) environment variables —
    the same contract as the reference's dist_train.sh MASTER_ADDR/RANK.
    """
    import jax

    if launcher in (None, "none"):
        return jax.process_index(), jax.process_count()
    if launcher != "jax":
        raise ValueError(f"unknown launcher {launcher!r}; use 'none' or 'jax'")

    def _env(*names, cast=str):
        for n in names:
            if n in os.environ:
                return cast(os.environ[n])
        return None

    coordinator_address = coordinator_address or _env("COORDINATOR_ADDRESS")
    num_processes = num_processes or _env("NUM_PROCESSES", "WORLD_SIZE",
                                          cast=int)
    process_id = (process_id if process_id is not None
                  else _env("PROCESS_ID", "RANK", cast=int))
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def coordination_barrier(name: str = "barrier", timeout_s: float = 600.0):
    """Wait until every process reaches this barrier.

    Goes through the distributed coordination service (the channel
    ``jax.distributed.initialize`` set up), NOT through a device collective —
    so it is safe to call before any collective executable has run. Use it to
    line ranks up before their first collective: XLA's CPU gloo rendezvous
    has a fixed ~30 s key-value deadline, so if one rank finishes compiling
    the train step >30 s after another, the fast rank's collective context
    init times out (observed under heavy machine load). Single-process: no-op.
    """
    import jax

    if jax.process_count() == 1:
        return
    try:
        # Private API (the only jax._src use in the codebase): jax exposes no
        # public host barrier. Verified against the pinned jax; if an upgrade
        # moves it, fail loudly — silently skipping would reintroduce the
        # rendezvous race this barrier exists to prevent.
        from jax._src import distributed

        client = distributed.global_state.client
        wait = client.wait_at_barrier if client is not None else None
    except (ImportError, AttributeError) as e:
        raise RuntimeError(
            "coordination_barrier relies on jax._src.distributed."
            "global_state.client.wait_at_barrier, which this jax version no "
            "longer provides — update sph_retina_tpu/parallel/distributed.py "
            "for the new internal layout") from e
    if wait is None:
        return
    wait(name, timeout_in_ms=int(timeout_s * 1000))


def data_mesh(axis_name: str = "data"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def make_global_batch(batch: dict, mesh) -> dict:
    """Assemble per-process local batches into one global batch sharded over
    the mesh's data axis. Each process passes only ITS slice; the global
    leading dimension is n_processes * local_batch. Single-process this is
    equivalent to a sharded device_put."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, batch)


def replicate_to_mesh(tree, mesh):
    """Fully replicate a (process-identical) pytree over every device.

    Leaves must hold the same values on every process (e.g. built from the
    same seed, or restored from the same checkpoint) — the replicated global
    array is assembled from each process's local copy without communication.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)


def host_local_copy(tree):
    """Replicated global arrays -> host-local numpy.

    A fully-replicated array keeps the complete value in every process's
    first addressable shard, so this needs no communication. Use it to run
    process-local computation (e.g. sharded eval) or to checkpoint from a
    single process."""
    import jax

    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(pull, tree)


def sync_global_value(x):
    """Assert-identical broadcast: process 0's value for everyone.

    Single-process: identity. Multi-process: multihost all-gather of the
    pytree, taking process 0's copy (reference seed broadcast semantics,
    mmdet/apis/train.py:19-49)."""
    import jax

    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    # Typically called at startup (seed broadcast) — often the process's
    # first collective, so line ranks up first (see all_gather_eval_arrays).
    coordination_barrier("sync_global_value", timeout_s=1800.0)
    gathered = multihost_utils.process_allgather(x)
    return jax.tree_util.tree_map(lambda g: np.asarray(g)[0], gathered)


def all_gather_eval_arrays(local: dict) -> dict:
    """Gather per-process eval arrays to every process.

    ``local``: dict of numpy arrays with a common leading (per-process item)
    dimension, identical across processes (pad to equal length first). Result
    concatenates the process shards along that leading dimension — the
    all_gather flavor of the reference's ``collect_results_gpu``
    (/root/reference/mmdet/apis/test.py:179-213).
    """
    import jax

    if jax.process_count() == 1:
        return dict(local)
    from jax.experimental import multihost_utils

    # Line ranks up before the gather: each rank reaches here only after
    # compiling + running its predict loop, and that skew (first-ever
    # predict compile, loaded host) can exceed the ~30 s gloo rendezvous
    # deadline of the collective's first execution.
    coordination_barrier("eval_gather", timeout_s=1800.0)
    gathered = multihost_utils.process_allgather(
        {k: np.asarray(v) for k, v in local.items()}, tiled=False)
    return {k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
            for k, v in gathered.items()}
