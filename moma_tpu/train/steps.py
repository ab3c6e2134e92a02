"""Jitted train/eval steps — vanilla supervised path.

One jitted function per step replaces the reference's per-batch Python hot
loop body (`helper/loops_moma.py:25-63`): forward, loss, backward, SGD
update, and metric computation all compile to a single XLA program.  Under
a data-sharded mesh the gradient mean over the global batch IS the
cross-replica reduction — no DDP wrapper, no explicit all_reduce
(reference: DDP backward hook + helper/util.py:134-139).

Augmentation runs on-device at the top of the step (see
moma_tpu/data/augment.py) so the host only ships uint8 pixels.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from moma_tpu.core.metrics import confusion_matrix
from moma_tpu.losses.functional import cross_entropy
from moma_tpu.train.state import TrainState


def make_vanilla_train_step(augment_fn: Callable | None = None, donate: bool = True):
    """Returns jit(step(state, batch, rng) -> (state, metrics)).

    batch: {'image': uint8/float NHWC, 'label': int32}.  If augment_fn is
    given it maps (images, rng) -> float images on device.
    """

    def step(state: TrainState, batch, rng):
        images, labels = batch["image"], batch["label"]
        if augment_fn is not None:
            images = augment_fn(images, rng)

        def loss_fn(params):
            (feats, logits), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, labels)
            return loss, (logits, mutated.get("batch_stats", {}))

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)

        top5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
        correct5 = jnp.any(top5 == labels[:, None], axis=-1)
        metrics = {
            "loss": loss,
            "acc1": jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
            * 100.0,
            "acc5": jnp.mean(correct5.astype(jnp.float32)) * 100.0,
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, n_cls: int, normalize_fn: Callable | None = None):
    """jit(step(params, batch_stats, batch) -> (loss_sum, n_valid, conf_mat)).

    batch carries a 'mask' marking valid rows — the static-shape answer to
    ragged final eval batches (reference pads nothing and accumulates
    ragged logits, helper/util.py:183-213).
    """

    @jax.jit
    def step(params, batch_stats, batch):
        images, labels, mask = batch["image"], batch["label"], batch["mask"]
        if normalize_fn is not None:
            images = normalize_fn(images)
        feats, logits = apply_fn(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        m = mask.astype(jnp.float32)
        loss_sum = jnp.sum(nll * m)
        cm = confusion_matrix(logits, labels, n_cls, mask=mask)
        return loss_sum, jnp.sum(m), cm

    return step
