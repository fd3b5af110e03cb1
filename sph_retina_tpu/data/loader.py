"""Batching + background prefetch, and a synthetic dataset for tests.

Replaces the reference's torch DataLoader workers
(mmdet/apis/train.py build_dataloader, workers_per_gpu=2) with a simple
thread-pool prefetcher: pipeline work is PIL/numpy (GIL-released), batches
are stacked host-side and handed to JAX; device transfer overlaps with
compute via a 2-deep prefetch queue.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .pipeline import SphPipeline


@dataclass
class DataLoader:
    dataset: object
    pipeline: SphPipeline
    batch_size: int = 8
    shuffle: bool = True
    seed: int = 0
    num_workers: int = 4
    drop_last: bool = True
    prefetch: int = 2
    # Multi-process data parallelism: each process reads shard ``shard_id``
    # of ``num_shards`` (torch DistributedSampler semantics: shuffle with a
    # process-identical per-epoch seed, wrap-pad so every shard has equal
    # length, then stride-slice).
    num_shards: int = 1
    shard_id: int = 0
    # Augmentation-stream seed (reference --diff-seed,
    # /root/reference/tools/train.py:62-65: per-rank augmentation
    # randomness). Defaults to ``seed``. Only the per-sample augmentation
    # rngs use it — the shuffle permutation must stay process-identical so
    # shards partition the epoch exactly.
    aug_seed: int | None = None

    def __len__(self):
        n = -(-len(self.dataset) // self.num_shards)  # padded shard length
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.num_shards > 1:
            total = len(self) * self.batch_size if self.drop_last else (
                -(-len(idx) // self.num_shards))
            total *= self.num_shards
            if total > len(idx):  # wrap-pad (DistributedSampler parity)
                idx = np.concatenate([idx, idx[: total - len(idx)]])
            idx = idx[self.shard_id:total:self.num_shards]
        if self.drop_last:
            idx = idx[: len(self) * self.batch_size]
        return idx

    def epoch(self, epoch: int = 0):
        """Yield stacked numpy batches with background prefetch."""
        indices = self._epoch_indices(epoch)
        batches = indices.reshape(-1, self.batch_size) if self.drop_last else [
            indices[i:i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            # num_workers=0 means "no parallelism", not "no pool":
            # ThreadPoolExecutor(0) raises inside this daemon thread and the
            # consumer would block forever on a queue that never closes.
            with ThreadPoolExecutor(max(1, self.num_workers)) as pool:
                for bi, batch_idx in enumerate(batches):
                    aug = self.seed if self.aug_seed is None else self.aug_seed
                    rngs = [
                        np.random.default_rng(
                            (aug, epoch, bi, int(i))
                        ) for i in batch_idx
                    ]
                    samples = list(pool.map(
                        lambda a: self.pipeline(self.dataset[int(a[0])], a[1]),
                        zip(batch_idx, rngs),
                    ))
                    out = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    q.put(out)

        def run():
            # A producer crash (decode error, bad path) must surface in the
            # consumer, not leave it blocked on a queue that never closes.
            try:
                produce()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)
            else:
                q.put(stop)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def prefetch_to_device(iterator, transfer, depth: int = 2):
    """Overlap host->device transfer with device compute.

    ``transfer`` maps a host batch to device arrays (``jax.device_put`` with
    the step's input sharding). Transfers run on a dedicated background
    thread, ``depth`` batches ahead of the consumer — the JAX analogue of
    the reference's pin_memory + non_blocking H2D copies in torch DataLoader
    workers. A thread (not inline dispatch) because ``jax.device_put`` can
    *block* until the copy lands on constrained host->device links (e.g.
    tunneled devices); it releases the GIL while copying, so the consumer
    keeps dispatching compute on batch k while batch k+1 streams in.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()

    def run():
        try:
            for batch in iterator:
                q.put(transfer(batch))
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)
        else:
            q.put(stop)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def make_synthetic_dataset(
    n_images: int = 8,
    num_classes: int = 7,
    img_size=(64, 128),
    box_version: int = 4,
    max_boxes: int = 6,
    seed: int = 0,
):
    """In-memory synthetic spherical dataset (test strategy parity with the
    vendored mmdet suite's tmpdir COCO fixtures, SURVEY.md §4B)."""
    from ..geometry.boxes import generate_boxes

    rng = np.random.default_rng(seed)
    h, w = img_size

    class _Synthetic:
        classes = tuple(f"class_{i}" for i in range(num_classes))
        num_classes_ = num_classes

        def __len__(self):
            return n_images

        def __getitem__(self, idx):
            r = np.random.default_rng((seed, idx))
            n = int(r.integers(1, max_boxes + 1))
            boxes = generate_boxes(n, box_version, seed=seed * 1000 + idx,
                                   fov_range=(10.0, 60.0))
            return {
                "img_id": idx,
                "image": (r.random((h, w, 3)) * 255).astype(np.uint8),
                "boxes": boxes,
                "labels": r.integers(0, num_classes, n).astype(np.int32),
            }

    return _Synthetic()
