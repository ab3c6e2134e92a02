"""Learning-rate schedules with reference-equivalent semantics.

Behavioral parity target: `helper/util.py:37-50` in the reference —
  * cosine:  eta_min = lr * decay_rate**3;
             lr(e) = eta_min + (lr - eta_min) * (1 + cos(pi * e / epochs)) / 2
             evaluated ONCE PER EPOCH with the integer epoch number (1-based
             in the reference loop).
  * step:    lr * decay_rate**(#decay_epochs strictly below current epoch).

We expose both an epoch-level function (exact parity) and an optax-ready
per-step schedule built from it (the value is held constant within an
epoch, as the reference does).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def lr_at_epoch(
    epoch: int,
    base_lr: float,
    epochs: int,
    cosine: bool = True,
    decay_rate: float = 0.1,
    decay_epochs: Sequence[int] = (150, 180, 210),
) -> float:
    """LR for a given (1-based) epoch; mirrors helper/util.py:37-50."""
    if cosine:
        eta_min = base_lr * decay_rate**3
        return eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * epoch / epochs)
        ) / 2
    steps = sum(1 for d in decay_epochs if epoch > d)
    return base_lr * decay_rate**steps


def lr_schedule(
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    cosine: bool = True,
    decay_rate: float = 0.1,
    decay_epochs: Sequence[int] = (150, 180, 210),
    warmup_epochs: float = 0.0,
):
    """Per-step schedule (traceable) holding the epoch-level value constant.

    Epoch numbering matches the reference loop (`train_teacher.py:244-250`):
    epoch e in 1..epochs adjusts the LR before the epoch runs.

    warmup_epochs > 0 (extension; the reference has no warmup) prepends a
    per-STEP linear ramp 0 -> lr(epoch 1) over the first warmup_epochs —
    the standard stabilizer for the large global batches a multi-chip
    data-parallel mesh trains at (8 x BS128 = BS1024), where the
    reference's 2-GPU recipe starts too hot.  After the ramp the schedule
    is untouched, so warmup_epochs=0 is exact reference parity.
    """
    decay_epochs = jnp.asarray(list(decay_epochs), dtype=jnp.float32)
    warmup_steps = float(warmup_epochs) * steps_per_epoch

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch) + 1
        epoch = epoch.astype(jnp.float32)
        if cosine:
            eta_min = base_lr * decay_rate**3
            lr = eta_min + (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * epoch / epochs)
            ) / 2
        else:
            n = jnp.sum(epoch[..., None] > decay_epochs, axis=-1)
            lr = base_lr * decay_rate**n
        if warmup_steps > 0:
            ramp = jnp.minimum((step.astype(jnp.float32) + 1.0) / warmup_steps, 1.0)
            lr = lr * ramp
        return lr

    return schedule
