"""Metrics: meters, top-k accuracy, confusion matrix, macro-F1.

Replaces the reference's `helper/util.py` AverageMeter/accuracy (:37-132)
and `process_accumulated_output` conf-mat path (:183-213), plus the inline
macro-F1 (`train_teacher.py:281-290`).  Device-side pieces are pure jnp so
they live inside the jitted step; cross-replica reduction is a `psum` over
the data axis (the reference used `dist.all_reduce`, helper/util.py:134-139).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


class Meter:
    """Streaming (sum, count) meter — host-side, mirrors AverageMeter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def accuracy_topk(logits: jnp.ndarray, labels: jnp.ndarray, topk=(1,)):
    """Top-k accuracy in percent, matching helper/util.py:115-131 semantics."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == labels[:, None]
    return [
        jnp.sum(correct[:, :k]) * (100.0 / labels.shape[0]) for k in topk
    ]


def confusion_matrix(
    logits: jnp.ndarray, labels: jnp.ndarray, n_cls: int, mask=None
) -> jnp.ndarray:
    """(n_cls, n_cls) conf-mat [true, pred] via one-hot matmul (MXU friendly).

    `mask` (B,) bool marks valid rows — static-shape replacement for the
    reference's ragged final batch handling (helper/util.py:183-213).
    """
    pred = jnp.argmax(logits, axis=-1)
    t = jax.nn.one_hot(labels, n_cls, dtype=jnp.float32)
    p = jax.nn.one_hot(pred, n_cls, dtype=jnp.float32)
    if mask is not None:
        t = t * mask[:, None].astype(jnp.float32)
    return t.T @ p


def macro_f1(conf_mat: np.ndarray) -> float:
    """Macro F1 from a confusion matrix [true, pred].

    Parity with the reference's inline computation: per-class
    f1 = 2*TP / (2*TP + FP + FN), classes with zero denominator counted
    as 0, MEAN over classes (train_student_moma.py:522-531, which divides
    by n_cls).  NOTE the reference is internally inconsistent — its
    teacher script's copy (train_teacher.py:281-290) forgets the division
    and reports the per-class SUM; best-F1 checkpoint selection is
    unaffected (argmax-equivalent), so we use the correct mean everywhere.
    """
    cm = np.asarray(conf_mat, dtype=np.float64)
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)
    return float(f1.mean())


def accuracy_from_conf_mat(conf_mat: np.ndarray) -> float:
    cm = np.asarray(conf_mat, dtype=np.float64)
    total = cm.sum()
    return float(np.diag(cm).sum() / max(total, 1.0))


@dataclass
class EvalAccumulator:
    """Host-side accumulator for an eval epoch: loss meter + conf-mat."""

    n_cls: int
    loss_sum: float = 0.0
    n: int = 0
    conf_mat: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.conf_mat is None:
            self.conf_mat = np.zeros((self.n_cls, self.n_cls), dtype=np.float64)

    def update(self, loss_sum: float, n: int, conf_mat):
        self.loss_sum += float(loss_sum)
        self.n += int(n)
        self.conf_mat += np.asarray(conf_mat, dtype=np.float64)

    @property
    def loss(self) -> float:
        return self.loss_sum / max(self.n, 1)

    @property
    def acc(self) -> float:
        return 100.0 * accuracy_from_conf_mat(self.conf_mat)

    @property
    def f1(self) -> float:
        return macro_f1(self.conf_mat)
