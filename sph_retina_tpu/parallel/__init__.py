"""Multi-host / multi-process data parallelism.

TPU-native replacement for the reference's torch.distributed/NCCL stack
(mmcv init_dist + MMDistributedDataParallel + collect_results, SURVEY.md
§2.4-2.5): one global ``jax.sharding.Mesh`` over every device of every
process, per-process input sharding, XLA-inserted gradient all-reduce over
ICI/DCN, and an all-gather based eval-result collection.
"""

from .distributed import (
    all_gather_eval_arrays,
    coordination_barrier,
    data_mesh,
    host_local_copy,
    init_distributed,
    make_global_batch,
    replicate_to_mesh,
    sync_global_value,
)
from .sharding import (
    batch_specs,
    fsdp_spec,
    make_mesh,
    shard_batch_spatial,
    shard_state_fsdp,
    sharded_pairwise_overlaps,
)

__all__ = [
    "init_distributed",
    "data_mesh",
    "make_global_batch",
    "replicate_to_mesh",
    "host_local_copy",
    "all_gather_eval_arrays",
    "sync_global_value",
    "coordination_barrier",
    "make_mesh",
    "batch_specs",
    "shard_batch_spatial",
    "fsdp_spec",
    "shard_state_fsdp",
    "sharded_pairwise_overlaps",
]
