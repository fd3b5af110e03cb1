#!/usr/bin/env bash
# Multi-process data-parallel training launcher.
#
# Parity with the reference launcher (/root/reference/tools/dist_train.sh:
# torch.distributed.launch --nproc_per_node=$GPUS --master_port=$PORT):
# spawns NPROC local processes that join one jax.distributed world; on a
# TPU pod slice run tools/train.py --launcher jax on every host instead
# (arguments auto-detected) and skip this script.
#
# Usage: tools/dist_train.sh CONFIG NPROC [extra train.py args...]
#   PORT=29500 (env) picks the coordinator port.
set -u
CONFIG=$1
NPROC=$2
shift 2
PORT=${PORT:-29500}
DIR=$(dirname "$0")

pids=()
for ((i = 0; i < NPROC; i++)); do
  COORDINATOR_ADDRESS=localhost:$PORT NUM_PROCESSES=$NPROC PROCESS_ID=$i \
    python "$DIR/train.py" "$CONFIG" --launcher jax "$@" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done
exit $rc
