"""Train states (pytrees) for the three training modes.

Replaces the reference's mutable nn.Module + optimizer + in-place buffers
with explicit functional state:
  * TrainState       — vanilla supervised (train_teacher.py path)
  * DistillState     — + frozen teacher variables and trainable aux-module
                        params for the loss zoo (ConvReg/SelfA/SRRL/SimKD/
                        CRD embeds — reference models/util.py)
  * MomaState        — + EMA teacher params, CMO head/attention params and
                        the MoCo queue state (memory, ptr) as pytree leaves
                        (reference mutates these in place: mem_moco.py:14-27,
                        contrast_trainer.py:207-211)
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


class DistillState(struct.PyTreeNode):
    """Student train state + frozen teacher + trainable loss-aux params.

    ``params`` is a dict {'student': ..., 'aux': ...} so one optimizer
    covers both (the reference builds one SGD over module_list trainables,
    train_student_moma.py:382-392).
    """

    step: jax.Array
    params: Any                      # {'student':…, 'aux':…}
    batch_stats: Any                 # {'student':…, 'aux':…}
    teacher_params: Any
    teacher_batch_stats: Any
    opt_state: optax.OptState
    extra: Any = None                # e.g. CRDMemory banks
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)    # student
    teacher_apply_fn: Callable = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


class MomaState(struct.PyTreeNode):
    """DistillState + EMA teacher + MoCo queue.

    The teacher doubles as the momentum encoder: its params are EMA-updated
    from the student every step (loops_moma.py:308-318), so unlike
    DistillState they are state, not constants.  Queue state is the
    functional port of the reference's registered buffers + pointer.
    """

    step: jax.Array
    params: Any                      # {'student':…, 'aux': CMO heads/attn}
    batch_stats: Any
    teacher_params: Any              # EMA-updated (same-arch mode) or FIXED
                                     # pretrained (cross-arch EmaTec mode)
    teacher_batch_stats: Any         # updated by key forward (BN train mode)
    queue: Any                       # moma_tpu.moma.queue.QueueState
    opt_state: optax.OptState
    ema_params: Any = None           # EmaTec mode: EMA copy of the student
    ema_batch_stats: Any = None      # (criterion_moco_att.py:344-419)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)
    teacher_apply_fn: Callable = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, **replacements):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **replacements,
        )


def make_sgd(
    schedule,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    nesterov: bool = False,
    grad_clip: float = 0.0,
    trust_ratio: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.SGD-equivalent chain: coupled weight decay added to the
    gradient BEFORE the momentum buffer (torch semantics), then heavy-ball
    momentum, then LR scaling.

    trust_ratio > 0 inserts LARS layer-adaptive scaling (You et al. 2017)
    between the decayed gradient and the momentum buffer — the large-
    global-batch stabilizer for multi-chip data-parallel runs (the
    reference's 2-GPU recipe never needed it).  The local LR multiplier
    trust_ratio * ||w|| / ||g + wd*w|| applies per weight tensor,
    matmul/conv kernels only (1-D params — BN scales/biases — keep the
    plain update, the standard LARS exemption).  0 = exact reference-SGD
    parity.
    """
    parts = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    if trust_ratio > 0:
        parts.append(
            optax.masked(
                optax.scale_by_trust_ratio(trust_coefficient=trust_ratio),
                lambda params: jax.tree_util.tree_map(
                    lambda p: p.ndim > 1, params
                ),
            )
        )
    if momentum > 0:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
