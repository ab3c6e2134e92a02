"""MoCo negative-queue state machine — functional port of the reference's
mutable memory banks (MoMA/mem_moco.py).

The reference mutates registered buffers in place mid-step: reads the
queue (clone/detach) for logits FIRST, then writes the new keys at the
pointer and advances it (mem_moco.py:89-99).  Here the queue is a pytree
leaf of MomaState; `step_*` functions return (logits, new_queue), making
the read-before-write ordering explicit and jit-safe.

All variants are covered:
  MoCo      single queue                      (mem_moco.py:69-100)
  MoCoAtt   attention applied inside          (:103-161) — attention fns
            are passed in, so this composes with CMO params
  MoCoST    dual student/teacher queues       (:165-204)
  MoCoSSTT  dual queues x optional dual query (:208-253)

Queue layout note: K x D with D on the lane dimension; the negative-logit
matmul q(B,D) @ queue^T hits the MXU as a (B,D)x(D,K) contraction.  When
scaling K, shard the queue over the 'model' mesh axis — logits then
arrive (B, K/model) sharded, and the CE's logsumexp reduces with one
psum (no gather of the full K+1 row).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class QueueState(struct.PyTreeNode):
    memory: Dict[str, jax.Array]  # name -> (K, D), L2-normalized rows
    ptr: jax.Array                # scalar int32, shared across banks

    @classmethod
    def create(cls, rng: jax.Array, K: int, n_dim: int, names=("memory",)):
        mems = {}
        for i, name in enumerate(names):
            k = jax.random.fold_in(rng, i)
            m = jax.random.normal(k, (K, n_dim), jnp.float32)
            m = m / jnp.linalg.norm(m, axis=1, keepdims=True)
            mems[name] = m
        return cls(memory=mems, ptr=jnp.zeros((), jnp.int32))

    @property
    def K(self) -> int:
        return next(iter(self.memory.values())).shape[0]


def queue_logits(
    q: jax.Array, k: jax.Array, queue: jax.Array, T: float
) -> jax.Array:
    """[pos | negs]/T — (B, 1+K) (mem_moco.py:29-49).  Positive at column 0,
    so the contrast labels are all-zeros (:94)."""
    pos = jnp.sum(q * k, axis=1, keepdims=True)
    neg = q @ queue.T  # (B, K) — MXU contraction over D
    return jnp.concatenate([pos, neg], axis=1) / T


def pos_logits(q: jax.Array, k: jax.Array, T: float) -> jax.Array:
    """Positive-only variant (mem_moco.py:51-66), used by MoCoAtt 'dual2'."""
    return jnp.sum(q * k, axis=1, keepdims=True) / T


def queue_update(
    state: QueueState, new_keys: Dict[str, jax.Array]
) -> QueueState:
    """Circular write of the gathered keys at the pointer, advance by the
    GLOBAL key count (mem_moco.py:14-27: index fmod(arange+ptr, K))."""
    n = next(iter(new_keys.values())).shape[0]
    K = state.K
    idx = jnp.mod(state.ptr + jnp.arange(n), K)
    mems = dict(state.memory)
    for name, keys in new_keys.items():
        mems[name] = state.memory[name].at[idx].set(
            jax.lax.stop_gradient(keys.astype(state.memory[name].dtype))
        )
    return state.replace(memory=mems, ptr=jnp.mod(state.ptr + n, K))


# --------------------------------------------------------------- variants

def step_moco(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    all_k: Optional[jax.Array],
    T: float,
) -> Tuple[jax.Array, QueueState]:
    """MoCo: logits from the pre-update queue, then enqueue all_k
    (mem_moco.py:77-100).  Labels are implicit zeros."""
    k = jax.lax.stop_gradient(k)
    queue = jax.lax.stop_gradient(state.memory["memory"])
    logits = queue_logits(q, k, queue, T)
    all_k = k if all_k is None else all_k
    new_state = queue_update(state, {"memory": all_k})
    return logits, new_state


def step_moco_att(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    all_k: Optional[jax.Array],
    T: float,
    attn_mode: str,
    attn_fns: Dict[str, Callable],
) -> Tuple[jax.Array, QueueState]:
    """MoCoAtt: attention modules applied to q/k/queue INSIDE the step
    (mem_moco.py:110-161).  attn_fns maps {'atts','atts_p','atts_n',
    'atts_q','atts_k','atts_queue'} to callables closing over CMO params."""
    bsz = q.shape[0]
    k = jax.lax.stop_gradient(k)
    queue = jax.lax.stop_gradient(state.memory["memory"])
    if attn_mode == "all":
        out = attn_fns["atts"](jnp.concatenate([q, k, queue], axis=0))
        q, k, queue = out[:bsz], out[bsz : 2 * bsz], out[2 * bsz :]
    elif attn_mode == "qk":
        out = attn_fns["atts"](jnp.concatenate([q, k], axis=0))
        q, k = out[:bsz], out[bsz:]
    elif attn_mode == "dual":
        out_p = attn_fns["atts_p"](jnp.concatenate([q, queue], axis=0))
        q, queue = out_p[:bsz], out_p[bsz:]
        out_n = attn_fns["atts_n"](jnp.concatenate([k, queue], axis=0))
        k, queue = out_n[:bsz], out_n[bsz:]
    elif attn_mode == "dual2":
        q = attn_fns["atts_p"](jnp.concatenate([q, k], axis=0))[:bsz]
        k = attn_fns["atts_n"](jnp.concatenate([k, q], axis=0))[:bsz]
    elif attn_mode in ("self_qk", "self_qkv2"):
        q = attn_fns["atts_q"](q)
        k = attn_fns["atts_k"](k)
    else:  # 'self' family: q/k/queue each through their own attention
        q = attn_fns["atts_q"](q)
        k = attn_fns["atts_k"](k)
        queue = attn_fns["atts_queue"](queue)

    if attn_mode == "dual2":
        logits = pos_logits(q, k, T)
    else:
        logits = queue_logits(q, k, queue, T)
    all_k = k if all_k is None else all_k
    new_state = queue_update(state, {"memory": all_k})
    return logits, new_state


def step_moco_st(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    k_t: jax.Array,
    all_k: Optional[jax.Array],
    all_k_t: Optional[jax.Array],
    T: float,
) -> Tuple[jax.Array, jax.Array, QueueState]:
    """MoCoST: dual banks -> (logits_ss, logits_st) (mem_moco.py:165-204)."""
    k = jax.lax.stop_gradient(k)
    k_t = jax.lax.stop_gradient(k_t)
    qs = jax.lax.stop_gradient(state.memory["memory_s"])
    qt = jax.lax.stop_gradient(state.memory["memory_t"])
    logits_ss = queue_logits(q, k, qs, T)
    logits_st = queue_logits(q, k_t, qt, T)
    new_state = queue_update(
        state,
        {
            "memory_s": k if all_k is None else all_k,
            "memory_t": k_t if all_k_t is None else all_k_t,
        },
    )
    return logits_ss, logits_st, new_state


def step_moco_sstt(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    q_t: Optional[jax.Array],
    k_t: jax.Array,
    all_k: Optional[jax.Array],
    all_k_t: Optional[jax.Array],
    T: float,
):
    """MoCoSSTT: dual banks x dual queries -> up to 4 logit sets
    (mem_moco.py:208-253)."""
    k = jax.lax.stop_gradient(k)
    k_t = jax.lax.stop_gradient(k_t)
    qs = jax.lax.stop_gradient(state.memory["memory_s"])
    qt = jax.lax.stop_gradient(state.memory["memory_t"])
    logits_ss = queue_logits(q, k, qs, T)
    logits_st = queue_logits(q, k_t, qt, T)
    out = [logits_ss, logits_st]
    if q_t is not None:
        out.append(queue_logits(q_t, k, qs, T))
        out.append(queue_logits(q_t, k_t, qt, T))
    new_state = queue_update(
        state,
        {
            "memory_s": k if all_k is None else all_k,
            "memory_t": k_t if all_k_t is None else all_k_t,
        },
    )
    return (*out, new_state)


# ------------------------------------------- model-sharded queue variants
#
# Used by the bn='local'/'sync' shard_map step when --model_parallel > 1:
# inside shard_map each device holds only its (K/mp, D) row block of the
# bank, so the GSPMD path's automatic handling of sharded operands is
# unavailable — the collectives are written out here.  Parity vs the
# replicated bank: tests/test_moma_local_bn_mp.py.


def _grad_psum(x: jax.Array, axis_name: str) -> jax.Array:
    """Identity forward; pmean of the cotangent over `axis_name`.

    Inside shard_map, per-rank reverse AD computes d(sum over ranks of the
    per-rank loss)/d(per-rank input).  Our loss value is REPLICATED across
    model ranks (every rank CEs the same all-gathered logits), so two
    factors appear on the negative-logit path: all_gather's transpose is a
    psum-scatter, handing rank r `mp * ct[block r]` (the identical
    cotangents of all mp ranks summed), and rank r's local matmul then
    yields `mp * partial_r` — each rank still missing the other shards'
    contributions.  pmean over the axis = psum(mp * partial_r)/mp = the
    full true dq, identically on every rank, while the (replicated)
    positive/CE/KL paths contribute exactly once.  Megatron's
    vocab-parallel cross-entropy solves the same problem with a
    hand-written backward.  Pinned numerically by
    tests/test_moma_local_bn_mp.py (trajectory + params vs the
    replicated-bank oracle)."""

    @jax.custom_vjp
    def ident(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        return (jax.lax.pmean(g, axis_name),)

    ident.defvjp(fwd, bwd)
    return ident(x)


def _grad_div(x: jax.Array, axis_name: str) -> jax.Array:
    """Identity forward; cotangent divided by the axis size.

    Companion to _grad_psum for the DIFFERENTIABLE-memory case: when the
    all-gathered (B, K) logits consume a sharded tensor that carries
    gradient (the ring-transformed queue), the gather's transpose hands
    each rank `mp * ct[own block]` (the identical cotangents of all mp
    ranks, psum-scattered).  Unlike q — whose shards' partials must be
    SUMMED across ranks (pmean) — the memory rows are disjoint per rank,
    so the true per-shard cotangent is just ct/mp."""

    @jax.custom_vjp
    def ident(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        return (g / jax.lax.psum(1, axis_name),)

    ident.defvjp(fwd, bwd)
    return ident(x)


def sharded_queue_logits_t(q: jax.Array, k: jax.Array, mem_local_t: jax.Array,
                           T: float, axis_name: str) -> jax.Array:
    """sharded_queue_logits for a TRANSFORMED (gradient-carrying) local
    memory block: same logit values, with the _grad_div correction so
    the attention producing mem_local_t receives the true per-shard
    cotangent (see ops/ring_attention.py boundary convention)."""
    pos = jnp.sum(q * k, axis=1, keepdims=True)
    neg_local = _grad_psum(q, axis_name) @ _grad_div(mem_local_t,
                                                     axis_name).T
    neg = jax.lax.all_gather(neg_local, axis_name, axis=1, tiled=True)
    return jnp.concatenate([pos, neg], axis=1) / T


def sharded_queue_logits(q: jax.Array, k: jax.Array, mem_local: jax.Array,
                         T: float, axis_name: str) -> jax.Array:
    """queue_logits with the bank rows sharded over `axis_name`.

    Per-element math is identical to the replicated version (each logit is
    one dot over D; row-sharding never reorders it), so logit VALUES are
    bit-identical; only dq's shard-sum order differs.  The all-gathered
    (B, K) logits cost B*K*4 bytes — trivial next to activations — and
    keep the CE on the standard replicated path."""
    pos = jnp.sum(q * k, axis=1, keepdims=True)
    neg_local = _grad_psum(q, axis_name) @ mem_local.T  # (B, K/mp)
    neg = jax.lax.all_gather(neg_local, axis_name, axis=1, tiled=True)
    return jnp.concatenate([pos, neg], axis=1) / T


def sharded_queue_update(state: QueueState, new_keys: Dict[str, jax.Array],
                         axis_name: str) -> QueueState:
    """Circular write with the bank's rows sharded over `axis_name`.

    Each rank owns global rows [r*Ksh, (r+1)*Ksh).  The write targets are
    (ptr + arange(n)) mod K — per-row scatter would serialize on TPU, so
    the update is a one-hot MXU contraction: W[j, i] = 1 iff local row j's
    global id equals target i; delta = W @ keys; rows with no target keep
    their value.  Targets are distinct (n <= K), so W has at most one 1
    per row."""
    n = next(iter(new_keys.values())).shape[0]
    Ksh = state.K  # LOCAL rows inside shard_map
    mp = jax.lax.psum(1, axis_name)
    K = Ksh * mp
    r = jax.lax.axis_index(axis_name)
    rows_global = r * Ksh + jnp.arange(Ksh)            # (Ksh,)
    targets = jnp.mod(state.ptr + jnp.arange(n), K)    # (n,), distinct
    W = (rows_global[:, None] == targets[None, :])     # (Ksh, n) one-hot
    written = jnp.any(W, axis=1, keepdims=True)        # (Ksh, 1)
    mems = dict(state.memory)
    for name, keys in new_keys.items():
        keys = jax.lax.stop_gradient(
            keys.astype(state.memory[name].dtype))
        delta = W.astype(keys.dtype) @ keys            # (Ksh, D) on the MXU
        mems[name] = jnp.where(written, delta, state.memory[name])
    return state.replace(memory=mems, ptr=jnp.mod(state.ptr + n, K))


def step_moco_sharded(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    all_k: Optional[jax.Array],
    T: float,
    axis_name: str,
) -> Tuple[jax.Array, QueueState]:
    """step_moco with the bank sharded over the model axis (shard_map)."""
    k = jax.lax.stop_gradient(k)
    mem_local = jax.lax.stop_gradient(state.memory["memory"])
    logits = sharded_queue_logits(q, k, mem_local, T, axis_name)
    all_k = k if all_k is None else all_k
    new_state = sharded_queue_update(state, {"memory": all_k}, axis_name)
    return logits, new_state


def step_moco_st_sharded(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    k_t: jax.Array,
    all_k: Optional[jax.Array],
    all_k_t: Optional[jax.Array],
    T: float,
    axis_name: str,
) -> Tuple[jax.Array, jax.Array, QueueState]:
    """step_moco_st with BOTH banks' rows sharded over the model axis.

    Each logit set rides the same explicit-collective path as
    step_moco_sharded (all-gathered (B, K/mp) logit blocks, _grad_psum
    on each q use so every model rank reconstructs the full dq); the
    dual circular writes are the one-hot MXU update per bank."""
    k = jax.lax.stop_gradient(k)
    k_t = jax.lax.stop_gradient(k_t)
    mem_s = jax.lax.stop_gradient(state.memory["memory_s"])
    mem_t = jax.lax.stop_gradient(state.memory["memory_t"])
    logits_ss = sharded_queue_logits(q, k, mem_s, T, axis_name)
    logits_st = sharded_queue_logits(q, k_t, mem_t, T, axis_name)
    new_state = sharded_queue_update(
        state,
        {
            "memory_s": k if all_k is None else all_k,
            "memory_t": k_t if all_k_t is None else all_k_t,
        },
        axis_name,
    )
    return logits_ss, logits_st, new_state


def step_moco_sstt_sharded(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    q_t: Optional[jax.Array],
    k_t: jax.Array,
    all_k: Optional[jax.Array],
    all_k_t: Optional[jax.Array],
    T: float,
    axis_name: str,
):
    """step_moco_sstt (dual banks x dual queries) with sharded banks."""
    k = jax.lax.stop_gradient(k)
    k_t = jax.lax.stop_gradient(k_t)
    mem_s = jax.lax.stop_gradient(state.memory["memory_s"])
    mem_t = jax.lax.stop_gradient(state.memory["memory_t"])
    out = [
        sharded_queue_logits(q, k, mem_s, T, axis_name),
        sharded_queue_logits(q, k_t, mem_t, T, axis_name),
    ]
    if q_t is not None:
        out.append(sharded_queue_logits(q_t, k, mem_s, T, axis_name))
        out.append(sharded_queue_logits(q_t, k_t, mem_t, T, axis_name))
    new_state = sharded_queue_update(
        state,
        {
            "memory_s": k if all_k is None else all_k,
            "memory_t": k_t if all_k_t is None else all_k_t,
        },
        axis_name,
    )
    return (*out, new_state)


def step_moco_att_sharded(
    state: QueueState,
    q: jax.Array,
    k: jax.Array,
    all_k: Optional[jax.Array],
    T: float,
    attn_mode: str,
    attn_fns: Dict[str, Callable],
    axis_name: str,
    ring_fns: Optional[Dict[str, Callable]] = None,
) -> Tuple[jax.Array, QueueState]:
    """step_moco_att with the bank's rows sharded over the model axis.

    The attention modules mix rows, so the queue-consuming modes
    ('all'/'dual'/the 'self' family's atts_queue) attend over the FULL
    bank.  Two routes:

    ring (default when `ring_fns` is given — CMOHeads.ring_attn_fns):
        ring flash attention (ops/ring_attention.py) — each device keeps
        its (K/mp, D) rows; key/value shards circulate over `axis_name`
        and the transformed bank STAYS sharded, feeding the explicit-
        collective sharded logits (sharded_queue_logits_t).  The full
        bank — raw or transformed — is never materialized on any device;
        this is what makes scaled-K x local-BN x model-parallel real
        (VERDICT r4 next #6).

    all-gather (fallback, ring_fns=None): gather the (K, D) rows and run
        the attention + logit math replicated — K*D*4 bytes per device
        (32 MB at K=16384/D=512); per-rank grads are already full.

    Either way the bank stays 'model'-sharded for storage and for the
    circular write (one-hot MXU update).  'qk'/'self_qk'/'self_qkv2'
    read the bank untransformed — they ride the cheaper
    sharded_queue_logits path — and 'dual2' never reads it at all."""
    bsz = q.shape[0]
    k = jax.lax.stop_gradient(k)
    mem_local = jax.lax.stop_gradient(state.memory["memory"])
    consumes_queue = attn_mode not in ("qk", "self_qk", "self_qkv2", "dual2")
    use_ring = ring_fns is not None and consumes_queue
    queue = None
    if consumes_queue and not use_ring:
        queue = jax.lax.all_gather(mem_local, axis_name, axis=0, tiled=True)
    queue_loc = None  # ring route: transformed bank rows, still sharded
    if attn_mode == "all":
        if use_ring:
            out_rep, queue_loc = ring_fns["atts"](
                jnp.concatenate([q, k], axis=0), mem_local)
            q, k = out_rep[:bsz], out_rep[bsz:]
        else:
            out = attn_fns["atts"](jnp.concatenate([q, k, queue], axis=0))
            q, k, queue = out[:bsz], out[bsz : 2 * bsz], out[2 * bsz :]
    elif attn_mode == "qk":
        out = attn_fns["atts"](jnp.concatenate([q, k], axis=0))
        q, k = out[:bsz], out[bsz:]
    elif attn_mode == "dual":
        if use_ring:
            q_out, queue_loc = ring_fns["atts_p"](q, mem_local)
            k_out, queue_loc = ring_fns["atts_n"](k, queue_loc)
            q, k = q_out, k_out
        else:
            out_p = attn_fns["atts_p"](jnp.concatenate([q, queue], axis=0))
            q, queue = out_p[:bsz], out_p[bsz:]
            out_n = attn_fns["atts_n"](jnp.concatenate([k, queue], axis=0))
            k, queue = out_n[:bsz], out_n[bsz:]
    elif attn_mode == "dual2":
        q = attn_fns["atts_p"](jnp.concatenate([q, k], axis=0))[:bsz]
        k = attn_fns["atts_n"](jnp.concatenate([k, q], axis=0))[:bsz]
    elif attn_mode in ("self_qk", "self_qkv2"):
        q = attn_fns["atts_q"](q)
        k = attn_fns["atts_k"](k)
    else:  # 'self' family
        q = attn_fns["atts_q"](q)
        k = attn_fns["atts_k"](k)
        if use_ring:
            _, queue_loc = ring_fns["atts_queue"](q[:0], mem_local)
        else:
            queue = attn_fns["atts_queue"](queue)

    if attn_mode == "dual2":
        logits = pos_logits(q, k, T)
    elif attn_mode in ("qk", "self_qk", "self_qkv2"):
        # bank read untransformed: the explicit-collective sharded path
        logits = sharded_queue_logits(q, k, mem_local, T, axis_name)
    elif use_ring:
        logits = sharded_queue_logits_t(q, k, queue_loc, T, axis_name)
    else:
        logits = queue_logits(q, k, queue, T)
    all_k = k if all_k is None else all_k
    new_state = sharded_queue_update(state, {"memory": all_k}, axis_name)
    return logits, new_state


def contrast_ce(logits: jax.Array) -> jax.Array:
    """CE over (K+1)-way contrast logits with the positive at column 0
    (contrast_trainer.py:189-205 + zeros labels)."""
    return -jnp.mean(jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)[:, 0])
