"""Host-side batch pipeline: arrays in RAM -> shuffled uint8 device batches.

Replaces the reference's torch DataLoader + DistributedSampler stack
(dataset/histo_dataset.py:372-419).  Because augmentation is on-device
(data/augment.py), the host work per batch is a single fancy-index gather
of uint8 rows — there is no per-sample Python transform, so no worker
pool is needed for in-memory datasets.  File-backed datasets use the
native prefetching reader in moma_tpu/data/native (later milestone).

Sharding: the loader yields GLOBAL batches; the caller device_puts them
with a batch-sharded NamedSharding, so each chip receives only its shard
(jax slices the host array — the TPU equivalent of DistributedSampler).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional

import numpy as np


class ArrayDataset:
    """(images uint8 NHWC, labels int64/int32) in RAM or memory-mapped.

    `bin_path` marks a packed on-disk dataset (moma_tpu/data/histo.py);
    when set, train Loaders route batch assembly through the native C++
    prefetcher (moma_tpu/data/native) instead of numpy fancy-indexing.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 bin_path: Optional[str] = None):
        assert images.shape[0] == labels.shape[0]
        assert images.ndim == 4, "NHWC expected"
        self.images = images
        self.labels = labels.astype(np.int32)
        self.bin_path = bin_path

    def __len__(self):
        return self.images.shape[0]


def synthetic_dataset(
    n: int, image_size: int, n_cls: int, seed: int = 0
) -> ArrayDataset:
    """Deterministic fake data for tests/benchmarks (no dataset downloads
    are possible in the build environment)."""
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, (n, image_size, image_size, 3), dtype=np.uint8)
    labels = rng.randint(0, n_cls, (n,)).astype(np.int32)
    return ArrayDataset(images, labels)


class Loader:
    """Epoch iterator over an ArrayDataset.

    train=True: per-epoch reshuffle (seeded — the reference's
    sampler.set_epoch equivalent), drop_last to keep shapes static.
    train=False: sequential; final ragged batch is padded and the 'mask'
    entry marks valid rows.
    Extra per-index arrays (e.g. CRD contrast indices) can be attached via
    `extras` — dict name -> (n, ...) array gathered with the batch.
    `num_workers` (the reference's DataLoader worker count) sizes the
    native prefetcher's gather thread pool for file-backed datasets;
    in-memory datasets need no workers (batch assembly is one numpy
    fancy-index).
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        train: bool,
        seed: int = 0,
        extras: Optional[Dict[str, np.ndarray]] = None,
        num_workers: int = 8,  # reference DataLoader default (train_teacher.py:41)
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.epoch = 0
        self.start_batch = 0
        self.extras = extras or {}
        self.num_workers = num_workers

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_start_batch(self, start: int):
        """Mid-epoch resume support (train only): the next iteration
        starts at batch `start` of this epoch's (deterministic, seeded)
        shuffle order — the skipped batches are pure index math, nothing
        is loaded or decoded.  Persistent until changed;
        train_one_epoch sets it every epoch (0 by default)."""
        self.start_batch = start

    def __len__(self):
        n = len(self.ds)
        if self.train:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    @property
    def n_samples(self):
        return len(self.ds)

    def _native_batcher(self):
        if getattr(self.ds, "bin_path", None) is None:
            return None
        if getattr(self, "_batcher", None) is None:
            try:
                import os

                from moma_tpu.data.native import NativeBatcher

                self._batcher = NativeBatcher(
                    self.ds.bin_path, len(self.ds), self.ds.images.shape[1:]
                )
                # threads beyond the core count only add contention
                # (measured: 8 threads on a 1-core host halves gather rate)
                self._batcher.start(
                    self.batch_size, depth=4,
                    threads=max(1, min(self.num_workers,
                                       os.cpu_count() or 1)))
            except Exception:
                self._batcher = False
        return self._batcher or None

    def __iter__(self) -> Iterator[dict]:
        n = len(self.ds)
        bs = self.batch_size
        if self.train:
            order = np.random.RandomState(
                (self.seed * 100003 + self.epoch) % (2**31)
            ).permutation(n)
            n_batches = n // bs
            start = getattr(self, "start_batch", 0)
            batcher = self._native_batcher()
            depth = 4
            if batcher is not None:
                for i in range(start, min(start + depth, n_batches)):
                    batcher.submit(order[i * bs : (i + 1) * bs])
            for i in range(start, n_batches):
                idx = order[i * bs : (i + 1) * bs]
                if batcher is not None:
                    images = batcher.get()
                    nxt = i + depth
                    if nxt < n_batches:
                        batcher.submit(order[nxt * bs : (nxt + 1) * bs])
                else:
                    images = self.ds.images[idx]
                batch = {
                    "image": images,
                    "label": self.ds.labels[idx],
                    "index": idx.astype(np.int32),
                }
                for k, v in self.extras.items():
                    batch[k] = v[idx]
                yield batch
        else:
            for i in range(math.ceil(n / bs)):
                idx = np.arange(i * bs, min((i + 1) * bs, n))
                pad = bs - idx.shape[0]
                mask = np.ones(bs, dtype=bool)
                if pad:
                    mask[idx.shape[0]:] = False
                    idx = np.concatenate([idx, np.zeros(pad, dtype=idx.dtype)])
                batch = {
                    "image": self.ds.images[idx],
                    "label": self.ds.labels[idx],
                    "index": idx.astype(np.int32),
                    "mask": mask,
                }
                for k, v in self.extras.items():
                    batch[k] = v[idx]
                yield batch
