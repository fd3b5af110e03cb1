"""Epoch-based training runner: loop, checkpoints, periodic eval, logging.

Reference semantics (mmcv EpochBasedRunner as driven by
mmdet/apis/train.py:117-246): per-epoch iteration, CheckpointHook interval,
periodic eval with best-metric tracking (save_best='bbox_mAP_50'),
TextLogger-style metric lines. TPU-native pieces: orbax checkpoints
(params/opt_state/step as one pytree), JSONL metric log (+ TensorBoard
events when the package is importable), one jitted step.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train import TrainState


@dataclass
class MetricLogger:
    """JSONL + TensorBoard (+ optional wandb) metric sink.

    Reference logging surface: TextLoggerHook + TensorboardLoggerHook at
    interval 10 and the optional WandbLoggerHook
    (/root/reference/mmdet/core/hook/wandblogger_hook.py); wandb here is
    opt-in via ``wandb_init`` kwargs and degrades to a no-op when the
    package is absent."""

    log_dir: str
    interval: int = 10
    enabled: bool = True  # False on non-zero ranks: log() still NaN-checks
    wandb_init: dict | None = None  # e.g. {"project": "sph", "name": "run1"}
    _file: object = field(default=None, repr=False)
    _tb: object = field(default=None, repr=False)
    _wandb: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.enabled:
            return
        os.makedirs(self.log_dir, exist_ok=True)
        self._file = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch is baked in

            self._tb = SummaryWriter(os.path.join(self.log_dir, "tb"))
        except Exception:
            self._tb = None
        if self.wandb_init is not None:
            try:
                import wandb

                self._wandb = wandb.init(dir=self.log_dir, **self.wandb_init)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        if not self.enabled:
            return
        record = {"step": step, "prefix": prefix,
                  **{k: float(v) for k, v in metrics.items()},
                  "time": time.time()}
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)
        if self._wandb is not None:
            self._wandb.log({f"{prefix}/{k}": float(v)
                             for k, v in metrics.items()}, step=step)

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def memory_report() -> dict:
    """Host + device memory snapshot (MemoryProfilerHook parity,
    mmdet/core/hook/memory_profiler_hook.py: virtual memory / process RSS
    every N iters — here without the psutil dependency, plus what the
    reference cannot see: per-device HBM in use / peak from PJRT)."""
    stats = {}
    try:
        with open("/proc/meminfo") as f:
            mem = {line.split(":")[0]: int(line.split()[1])
                   for line in f if ":" in line}
        stats["host_available_mb"] = mem.get("MemAvailable", 0) // 1024
        stats["host_total_mb"] = mem.get("MemTotal", 0) // 1024
    except OSError:
        pass
    try:
        import resource

        stats["process_rss_mb"] = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024)
    except Exception:
        pass
    for i, dev in enumerate(jax.local_devices()):
        try:
            ms = dev.memory_stats()
        except Exception:
            ms = None
        if ms:
            stats[f"device{i}_in_use_mb"] = ms.get("bytes_in_use", 0) >> 20
            peak = ms.get("peak_bytes_in_use")
            if peak is not None:
                stats[f"device{i}_peak_mb"] = peak >> 20
    return stats


class Checkpointer:
    """Orbax wrapper: interval saves, best-metric tracking, resume."""

    def __init__(self, ckpt_dir: str, save_best: str | None = "AP50"):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.save_best = save_best
        self.best = -np.inf
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, state: TrainState, epoch: int, metric: float | None = None):
        path = os.path.join(self.dir, f"epoch_{epoch}")
        self._ckpt.save(path, state, force=True)
        # Orbax saves are ASYNC (finalized by a background commit); only
        # advance latest.txt once the checkpoint is durably on disk, or a
        # crash in the commit window leaves latest.txt pointing at a
        # checkpoint that never existed (found by the 4-rank mid-run-kill
        # test). Epoch-granularity saves make the wait cheap.
        self._ckpt.wait_until_finished()
        latest = os.path.join(self.dir, "latest.txt")
        tmp = latest + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"epoch_{epoch}")
        os.replace(tmp, latest)
        if metric is not None and self.save_best and metric > self.best:
            self.best = metric
            self._ckpt.save(os.path.join(self.dir, "best"), state, force=True)

    def latest_path(self):
        latest = os.path.join(self.dir, "latest.txt")
        candidate = None
        if os.path.exists(latest):
            with open(latest) as f:
                candidate = os.path.join(self.dir, f.read().strip())
        if candidate is not None and os.path.isdir(candidate):
            return candidate
        # Dangling or missing pointer (e.g. a crash between checkpoint
        # commit and the pointer update): fall back to the newest complete
        # epoch_N directory on disk.
        epochs = []
        try:
            for name in os.listdir(self.dir):
                if name.startswith("epoch_") and os.path.isdir(
                        os.path.join(self.dir, name)):
                    try:
                        epochs.append((int(name.split("_", 1)[1]), name))
                    except ValueError:
                        pass
        except OSError:
            return None
        if not epochs:
            return None
        return os.path.join(self.dir, max(epochs)[1])

    def restore(self, state: TrainState, path: str | None = None) -> TrainState:
        path = path or self.latest_path()
        if path is None:
            return state
        return self._ckpt.restore(path, state)

    def wait(self):
        self._ckpt.wait_until_finished()


class RankZeroCheckpointer(Checkpointer):
    """Multi-process checkpointing via host-local snapshots.

    Replicated global arrays keep the full value in every process, so the
    checkpoint is taken as a host-local copy (plain numpy, fully addressable)
    and handed to orbax from EVERY process — orbax's save is itself a
    cross-process collective (it barriers internally), with only the primary
    process writing the replicated data. Restore reads the same files on
    every process (shared filesystem, as the reference assumes for
    work_dirs; mmdet/apis/test.py:136-178 tmpdir semantics)."""

    def save(self, state: TrainState, epoch: int, metric: float | None = None):
        from ..parallel import host_local_copy

        super().save(host_local_copy(state), epoch, metric)

    def restore(self, state: TrainState, path: str | None = None) -> TrainState:
        from ..parallel import coordination_barrier, host_local_copy

        # Restore is usually the process's FIRST collective (orbax barriers
        # internally via sync_global_devices): line ranks up through the
        # coordination service first, or startup skew >30 s (the fixed gloo
        # rendezvous deadline) kills the fast rank's context init.
        coordination_barrier("ckpt_restore", timeout_s=1800.0)
        return super().restore(host_local_copy(state), path)


def run_training(
    *,
    train_step,
    state: TrainState,
    loader,
    max_epochs: int,
    logger: MetricLogger,
    checkpointer: Checkpointer | None = None,
    ckpt_interval: int = 25,
    eval_fn=None,
    eval_interval: int = 5,
    shard=lambda b: b,
    memory_interval: int | None = None,
):
    """The main loop. ``eval_fn(state) -> dict`` runs on eval epochs."""
    step_count = int(state.step)
    compiled_step = None  # multi-process: AOT-compiled executable
    first_call = jax.process_count() > 1 and hasattr(train_step, "lower")
    # Resume at the epoch the restored step count implies (mmcv
    # EpochBasedRunner resume semantics) rather than replaying from epoch 0.
    steps_per_epoch = max(1, len(loader)) if hasattr(loader, "__len__") else None
    start_epoch = min(step_count // steps_per_epoch, max_epochs) \
        if steps_per_epoch else 0
    from ..data.loader import prefetch_to_device

    for epoch in range(start_epoch, max_epochs):
        t_epoch = time.time()
        # Transfers dispatch 2 batches ahead of the step (device_put is
        # async), overlapping H2D copies with device compute.
        for global_batch in prefetch_to_device(loader.epoch(epoch), shard):
            if first_call:
                # Multi-process: compile BEFORE the first execution, then
                # line every rank up at the coordination-service barrier.
                # The first executed collective initializes its gloo/NCCL
                # context under a fixed ~30 s rendezvous deadline inside
                # XLA; without the barrier, a rank whose compile runs >30 s
                # longer than another's (cold cache, loaded machine) times
                # the fast rank out. The compiled executable is then used
                # directly — same static shapes every step by design.
                #
                # The compile itself is rank-staggered: rank 0 compiles
                # first and populates the persistent compilation cache
                # (JAX_COMPILATION_CACHE_DIR, shared filesystem — the SPMD
                # program is identical on every rank), then the others
                # compile against the warm cache. N concurrent cold
                # compiles on a loaded host otherwise skew rank arrival by
                # many minutes (observed: 4 ranks on one core blowing a
                # 600 s barrier).
                from ..parallel import coordination_barrier

                if jax.process_index() != 0:
                    coordination_barrier("train_step_compile_rank0",
                                         timeout_s=1800.0)
                compiled_step = train_step.lower(
                    state, global_batch).compile()
                if jax.process_index() == 0:
                    coordination_barrier("train_step_compile_rank0",
                                         timeout_s=1800.0)
                coordination_barrier("train_step_compiled",
                                     timeout_s=1800.0)
                first_call = False
            if compiled_step is not None:
                try:
                    state, metrics = compiled_step(state, global_batch)
                except TypeError:
                    # The AOT executable is pinned to the first batch's
                    # shapes (safe for every in-tree loader: drop_last +
                    # fixed max_gt padding), but run_training is public and
                    # a drop_last=False loader yields a ragged final batch —
                    # recompile through jit like the single-process path
                    # rather than crash mid-epoch.
                    state, metrics = train_step(state, global_batch)
            else:
                state, metrics = train_step(state, global_batch)
            step_count += 1
            if step_count % logger.interval == 0:
                jax.block_until_ready(metrics)
                # NaN-loss detection (CheckLossHook parity,
                # mmdet/core/hook/checkloss_hook.py)
                loss_val = float(metrics.get("loss", 0.0))
                if loss_val != loss_val:
                    logger.log(step_count, {"nan_loss": 1.0}, prefix="error")
                    raise FloatingPointError(
                        f"loss is NaN at step {step_count}")
                logger.log(step_count, metrics)
            if memory_interval and step_count % memory_interval == 0:
                logger.log(step_count, memory_report(), prefix="memory")
        epoch_time = time.time() - t_epoch
        logger.log(step_count, {"epoch": epoch, "epoch_time": epoch_time},
                   prefix="epoch")

        metric = None
        if eval_fn is not None and (epoch + 1) % eval_interval == 0:
            results = eval_fn(state)
            logger.log(step_count, results, prefix="val")
            metric = results.get("AP50")
        if checkpointer is not None and (
            (epoch + 1) % ckpt_interval == 0 or epoch + 1 == max_epochs
        ):
            checkpointer.save(state, epoch + 1, metric)
    if checkpointer is not None:
        checkpointer.wait()
    return state
