"""CIFAR-100 from the standard on-disk pickle layout (no download — the
build environment has no egress; parity target dataset/cifar100.py:72-117).

Expects `<data_dir>/cifar-100-python/{train,test}` as distributed by the
canonical tarball.  Returns ArrayDatasets in NHWC uint8; augmentation is
on-device (data/augment.py), so there is no transform stack here.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

from moma_tpu.data.pipeline import ArrayDataset


def _load_split(data_dir: str, split: str) -> ArrayDataset:
    path = os.path.join(data_dir, "cifar-100-python", split)
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    images = (
        np.asarray(d["data"], dtype=np.uint8)
        .reshape(-1, 3, 32, 32)
        .transpose(0, 2, 3, 1)  # NCHW -> NHWC
        .copy()
    )
    labels = np.asarray(d["fine_labels"], dtype=np.int32)
    return ArrayDataset(images, labels)


def cifar100_available(data_dir: str) -> bool:
    return os.path.exists(os.path.join(data_dir, "cifar-100-python", "train"))


def load_cifar100(data_dir: str) -> Tuple[ArrayDataset, ArrayDataset]:
    """(train, test) — the reference has no separate CIFAR val split; it
    validates on the test set (dataset/cifar100.py get_cifar100_dataloaders)."""
    return _load_split(data_dir, "train"), _load_split(data_dir, "test")
