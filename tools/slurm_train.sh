#!/usr/bin/env bash
# SLURM launcher for multi-host data-parallel training.
#
# Parity with /root/reference/tools/slurm_train.sh (srun around
# tools/train.py with GPUS/GPUS_PER_NODE/CPUS_PER_TASK knobs): one task per
# host; each task joins the jax.distributed world via the SLURM-provided
# rank/world/coordinator variables consumed by --launcher jax.
#
# Usage: tools/slurm_train.sh PARTITION JOB_NAME CONFIG [extra args...]
#   NNODES=2 PORT=29500 (env) size the job.
set -u
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
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
python $DIR/train.py $CONFIG --launcher jax $*"
