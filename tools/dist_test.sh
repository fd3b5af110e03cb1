#!/usr/bin/env bash
# Multi-process data-parallel evaluation launcher.
#
# Parity with /root/reference/tools/dist_test.sh (torch.distributed.launch
# around tools/test.py): spawns NPROC local processes that join one
# jax.distributed world; the dataset is sharded per process and results are
# all-gathered before scoring (tools/test.py --launcher jax).
#
# Usage: tools/dist_test.sh CONFIG CHECKPOINT NPROC [extra test.py args...]
#   PORT=29500 (env) picks the coordinator port.
set -u
CONFIG=$1
CHECKPOINT=$2
NPROC=$3
shift 3
PORT=${PORT:-29500}
DIR=$(dirname "$0")

pids=()
for ((i = 0; i < NPROC; i++)); do
  COORDINATOR_ADDRESS=localhost:$PORT NUM_PROCESSES=$NPROC PROCESS_ID=$i \
    python "$DIR/test.py" "$CONFIG" "$CHECKPOINT" --launcher jax "$@" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done
exit $rc
