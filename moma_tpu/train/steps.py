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

from moma_tpu.core import jitopt
from moma_tpu.core.metrics import confusion_matrix
from moma_tpu.losses.functional import cross_entropy
from moma_tpu.train.state import TrainState


def make_vanilla_train_step(augment_fn: Callable | None = None, donate: bool = True,
                            grad_accum: int = 1, remat: bool = False):
    """Returns jit(step(state, batch, rng) -> (state, metrics)).

    batch: {'image': uint8/float NHWC, 'label': int32}.  If augment_fn is
    given it maps (images, rng) -> float images on device.

    grad_accum=M > 1 splits the batch into M equal microbatches processed
    sequentially under lax.scan with ONE optimizer update at the end —
    the memory lever for batches whose activations exceed HBM (activation
    memory shrinks by M; the MXU still sees B/M-row matmuls, so keep
    B/M >= 64 to stay on the BS128 layout regime, BASELINE.md).  Each
    microbatch is one virtual DDP rank of the reference's world: CE-mean
    gradients averaged over microbatches equal the global-batch mean
    (equal sizes), while BatchNorm sees PER-MICROBATCH statistics — the
    reference's per-GPU BN semantics (its DDP never syncs BN), with
    running stats chained sequentially instead of averaged in parallel.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def forward_loss(params, batch_stats, apply_fn, images, labels):
        def fwd(p, bs, im):
            return apply_fn(
                {"params": p, "batch_stats": bs}, im,
                train=True, mutable=["batch_stats"],
            )

        if remat:
            # full-forward rematerialization: the backward recomputes the
            # forward instead of holding every activation (RunConfig.remat)
            fwd = jax.checkpoint(fwd)

        def loss_fn(p):
            (feats, logits), mutated = fwd(p, batch_stats, images)
            loss = cross_entropy(logits, labels)
            return loss, (logits, mutated.get("batch_stats", {}))

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def batch_metrics(loss, logits, labels):
        top5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
        correct5 = jnp.any(top5 == labels[:, None], axis=-1)
        return {
            "loss": loss,
            "acc1": jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
            * 100.0,
            "acc5": jnp.mean(correct5.astype(jnp.float32)) * 100.0,
        }

    def step(state: TrainState, batch, rng):
        images, labels = batch["image"], batch["label"]
        if augment_fn is not None:
            images = augment_fn(images, rng)

        if grad_accum == 1:
            (loss, (logits, new_bs)), grads = forward_loss(
                state.params, state.batch_stats, state.apply_fn, images, labels
            )
            new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
            return new_state, batch_metrics(loss, logits, labels)

        B = images.shape[0]
        if B % grad_accum != 0:
            raise ValueError(
                f"batch size {B} not divisible by grad_accum={grad_accum}"
            )
        mb = B // grad_accum
        mb_images = images.reshape(grad_accum, mb, *images.shape[1:])
        mb_labels = labels.reshape(grad_accum, mb)

        def body(carry, xs):
            bstats, gsum, msum = carry
            im, lb = xs
            (loss, (logits, new_bstats)), grads = forward_loss(
                state.params, bstats, state.apply_fn, im, lb
            )
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            m = batch_metrics(loss, logits, lb)
            msum = jax.tree_util.tree_map(jnp.add, msum, m)
            return (new_bstats, gsum, msum), None

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zeros_m = {k: jnp.zeros((), jnp.float32) for k in ("loss", "acc1", "acc5")}
        (final_bs, gsum, msum), _ = jax.lax.scan(
            body, (state.batch_stats, zeros_g, zeros_m), (mb_images, mb_labels)
        )
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        metrics = jax.tree_util.tree_map(lambda m: m / grad_accum, msum)
        new_state = state.apply_gradients(grads, new_batch_stats=final_bs)
        return new_state, metrics

    return jitopt.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, n_cls: int, normalize_fn: Callable | None = None):
    """jit(step(params, batch_stats, batch) -> (loss_sum, n_valid, conf_mat)).

    batch carries a 'mask' marking valid rows — the static-shape answer to
    ragged final eval batches (reference pads nothing and accumulates
    ragged logits, helper/util.py:183-213).
    """

    @jitopt.jit
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
