#!/usr/bin/env bash
# Deterministic multi-process training launcher.
#
# Parity with /root/reference/tools/dist_train_det.sh (torch launcher with
# --seed 42 --deterministic). Determinism policy here (documented in
# README.md "Determinism"):
#   - one fixed --seed drives weight init, the generic train-step rng
#     (fold_in(seed, step)), the epoch shuffle permutation (seed + epoch,
#     process-identical so shards partition exactly), and per-sample
#     augmentation streams ((seed, epoch, batch, index) tuples);
#   - XLA is deterministic for this model family on TPU/CPU by default
#     (no atomics-based scatter on the hot path), so a rerun with the same
#     seed and process count reproduces losses bit-for-bit.
#
# Usage: tools/dist_train_det.sh CONFIG NPROC [extra train.py args...]
set -u
CONFIG=$1
NPROC=$2
shift 2
exec "$(dirname "$0")/dist_train.sh" "$CONFIG" "$NPROC" --seed 42 "$@"
