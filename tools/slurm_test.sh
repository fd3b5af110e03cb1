#!/usr/bin/env bash
# SLURM launcher for multi-host distributed evaluation.
#
# Parity with /root/reference/tools/slurm_test.sh (srun around
# tools/test.py): one task per host, each joining the jax.distributed
# world via --launcher jax; results are all-gathered and rank 0 reports.
#
# Usage: tools/slurm_test.sh PARTITION JOB_NAME CONFIG CHECKPOINT [extra args...]
#   NNODES=2 PORT=29500 (env) size the job.
set -u
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
NNODES=${NNODES:-1}
PORT=${PORT:-29500}
DIR=$(dirname "$0")

srun -p "$PARTITION" \
  --job-name="$JOB_NAME" \
  --nodes="$NNODES" \
  --ntasks="$NNODES" \
  --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  bash -c "COORDINATOR_ADDRESS=\$(scontrol show hostnames \$SLURM_JOB_NODELIST | head -n1):$PORT \
NUM_PROCESSES=\$SLURM_NTASKS PROCESS_ID=\$SLURM_PROCID \
python $DIR/test.py $CONFIG $CHECKPOINT --launcher jax $*"
