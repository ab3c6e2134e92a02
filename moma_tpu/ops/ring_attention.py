"""Ring flash attention over a sharded token set (model-axis collective).

Built for the MoCoAtt queue-consuming modes under a 'model'-sharded
negative bank (mem_moco.py:124-126 attends over [q; k; queue] = 2B+K
tokens): round 4's `step_moco_att_sharded` all-gathered the (K, D) bank
per device before attending — re-materializing exactly the array the
sharding exists to split (VERDICT r4 weak #5).  This module attends
WITHOUT ever holding the full bank on any device:

  token set  = [replicated batch tokens (Nb)] + [sharded rows (Ksh/dev)]
  queries    = the local tokens (Nb + Ksh)
  keys       = ALL tokens — the replicated block locally, the sharded
               rows by circulating each device's (K/mp, d) key/value
               shard around the model-axis ring (lax.ppermute), flash-
               accumulating online-softmax stats (m, l, acc) per hop.

Memory: O(Nb + 2*Ksh) rows resident per device (local shard + one
in-flight shard) — the full K never exists.  Communication: mp-1
ppermute hops forward, mp hops backward (the standard ring-attention
schedule; Liu & Abbeel 2023, arXiv:2310.01889, reimplemented from the
paper's schedule).

The custom VJP is what makes this usable under `jax.grad` inside
shard_map: naive autodiff of the forward scan would checkpoint every
circulated K/V shard (= the full projected bank, defeating the point).
Instead the backward RE-circulates:

  pass 1 (local): rebuild the probability tile against the replicated
          batch keys from the saved (m, l) row stats; accumulate dQ and
          the batch keys' dK/dV from local queries only (each device's
          replicated block is an independent per-device input — the
          surrounding shard_map/psum boundary owns cross-device
          replication bookkeeping).
  pass 2 (ring): circulate the QUERY-side block (Q, dO, m, l, delta)
          plus its travelling dQ accumulator; each hop the visiting
          block deposits its contribution into the LOCAL shard's dK/dV
          and picks up dQ from the local keys.  After mp hops the block
          is home with its full dQ.

Exactness: probabilities are rebuilt from the FINAL (m, l) — softmax
tiles are exact regardless of the forward's accumulation order, so the
backward needs no per-hop stats.  f32 stats and accumulators throughout
(matmuls run in the input dtype — on TPU the MXU rounds f32 operands to
bf16 anyway; CLAUDE.md session-19 lore).

Parity oracle: tests/test_ring_attention.py (vs dense softmax on one
device and vs the replicated BatchTokenAttention through the sharded
MoMA step).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _flash_update(carry, q32, k, v):
    """One online-softmax accumulation of q32 (H, Nq, d) against a key/
    value block (H, Nc, d).  q32 is PRE-SCALED f32; carry is (m, l, acc)
    all f32."""
    m, l, acc = carry
    s = jnp.einsum("hnd,hcd->hnc", q32, k.astype(jnp.float32))
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum("hnc,hcd->hnd", p, v.astype(jnp.float32))
    return m_new, l, acc


def _ring_forward(q32, kq, vq, kb, vb, axis_name, mp):
    """Returns (o32, m, l) for the local queries."""
    H, nq, d = q32.shape
    m = jnp.full((H, nq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((H, nq, 1), jnp.float32)
    acc = jnp.zeros((H, nq, d), jnp.float32)
    carry = (m, l, acc)
    if kb is not None:
        carry = _flash_update(carry, q32, kb, vb)
    perm = [(i, (i + 1) % mp) for i in range(mp)]

    def body(state, _):
        carry, kv = state
        carry = _flash_update(carry, q32, kv[0], kv[1])
        kv = jax.lax.ppermute(kv, axis_name, perm)
        return (carry, kv), None

    (carry, _), _ = jax.lax.scan(body, (carry, (kq, vq)), None, length=mp)
    m, l, acc = carry
    return acc / l, m, l


def _tile_grads(q32, k, v, do32, m, l, delta):
    """Exact softmax tile vs one key block -> (dq_contrib, dk, dv).
    dq_contrib is UNSCALED (caller multiplies by scale once)."""
    k32 = k.astype(jnp.float32)
    s = jnp.einsum("hnd,hcd->hnc", q32, k32)
    p = jnp.exp(s - m) / l
    dv = jnp.einsum("hnc,hnd->hcd", p, do32)
    dp = jnp.einsum("hnd,hcd->hnc", do32, v.astype(jnp.float32))
    ds = p * (dp - delta)
    dq = jnp.einsum("hnc,hcd->hnd", ds, k32)
    dk = jnp.einsum("hnc,hnd->hcd", ds, q32)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ring_attention(
    q: jax.Array,
    kq: jax.Array,
    vq: jax.Array,
    kb: Optional[jax.Array],
    vb: Optional[jax.Array],
    scale: float,
    axis_name: str,
) -> jax.Array:
    """softmax(q @ [kb; all-ring kq]^T * scale) @ [vb; all-ring vq].

    q (H, Nq, d): this device's queries.  kq/vq (H, Ksh, d): this
    device's shard of the ring-circulated keys/values.  kb/vb
    (H, Nb, d) or None: keys/values counted ONCE globally but computed
    per-device (the replicated batch block).  Every query attends over
    Nb + mp*Ksh keys.  Differentiable in q/kq/vq/kb/vb."""
    mp = jax.lax.psum(1, axis_name)
    q32 = q.astype(jnp.float32) * scale
    o, _, _ = _ring_forward(q32, kq, vq, kb, vb, axis_name, mp)
    return o.astype(q.dtype)


def _ring_attention_fwd(q, kq, vq, kb, vb, scale, axis_name):
    mp = jax.lax.psum(1, axis_name)
    q32 = q.astype(jnp.float32) * scale
    o, m, l = _ring_forward(q32, kq, vq, kb, vb, axis_name, mp)
    return o.astype(q.dtype), (q, kq, vq, kb, vb, o, m, l)


def _ring_attention_bwd(scale, axis_name, res, g):
    q, kq, vq, kb, vb, o, m, l = res
    mp = jax.lax.psum(1, axis_name)
    q32 = q.astype(jnp.float32) * scale
    do32 = g.astype(jnp.float32)
    delta = jnp.sum(do32 * o, axis=-1, keepdims=True)  # (H, Nq, 1)

    # pass 1: replicated batch keys, local queries only
    if kb is not None:
        dq_b, dkb, dvb = _tile_grads(q32, kb, vb, do32, m, l, delta)
        dkb = (dkb * scale).astype(kb.dtype)
        dvb = dvb.astype(vb.dtype)
    else:
        dq_b = jnp.zeros_like(q32)
        dkb = dvb = None

    # pass 2: circulate the query block; keys stay home.  The visiting
    # block deposits into the local shard's dk/dv and accumulates its
    # own dq.  perm order matches the forward (shift +1), so after mp
    # hops every (query block, key shard) pair has met once and the
    # block is home.
    perm = [(i, (i + 1) % mp) for i in range(mp)]
    H, Ksh, d = kq.shape
    dkq = jnp.zeros((H, Ksh, d), jnp.float32)
    dvq = jnp.zeros((H, Ksh, d), jnp.float32)
    dq_travel = jnp.zeros_like(q32)

    def body(state, _):
        (blk_q32, blk_do, blk_m, blk_l, blk_delta, blk_dq), dkq, dvq = state
        dq_c, dk_c, dv_c = _tile_grads(
            blk_q32, kq, vq, blk_do, blk_m, blk_l, blk_delta)
        dkq = dkq + dk_c
        dvq = dvq + dv_c
        blk = (blk_q32, blk_do, blk_m, blk_l, blk_delta, blk_dq + dq_c)
        blk = jax.lax.ppermute(blk, axis_name, perm)
        return (blk, dkq, dvq), None

    init_blk = (q32, do32, m, l, delta, dq_travel)
    ((_, _, _, _, _, dq_travel), dkq, dvq), _ = jax.lax.scan(
        body, (init_blk, dkq, dvq), None, length=mp)
    # forward visited shards with +1 shifts between flash updates; the
    # backward shifts the QUERY block the same direction, which pairs
    # each block with every shard exactly once (cyclic group) — order
    # differs from the forward's, but exact tiles make order irrelevant.

    dq = ((dq_b + dq_travel) * scale).astype(q.dtype)
    return dq, (dkq * scale).astype(kq.dtype), dvq.astype(vq.dtype), dkb, dvb


ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


def ring_batch_token_attention(
    x_rep: Optional[jax.Array],
    x_loc: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    num_heads: int,
    axis_name: str,
) -> Tuple[Optional[jax.Array], jax.Array]:
    """BatchTokenAttention (cmo.py:28-58) over [x_rep; sharded x_loc].

    x_rep (Nb, C) or None: tokens replicated across the model axis
    (counted once in the softmax).  x_loc (Ksh, C): this device's shard
    of the distributed rows.  Returns (out_rep, out_loc) — the attention
    outputs for the replicated block and the local shard; out_loc stays
    sharded, so the full transformed bank is never materialized either.
    """
    C = x_loc.shape[-1]
    H = num_heads
    hd = C // H

    def project(x):
        qkv = x @ qkv_kernel
        if qkv_bias is not None:
            qkv = qkv + qkv_bias
        n = x.shape[0]
        qkv = qkv.reshape(n, 3, H, hd).transpose(1, 2, 0, 3)  # (3, H, n, hd)
        return qkv[0], qkv[1], qkv[2]

    q_loc, k_loc, v_loc = project(x_loc)
    if x_rep is not None:
        q_rep, k_rep, v_rep = project(x_rep)
        q_all = jnp.concatenate([q_rep, q_loc], axis=1)
    else:
        k_rep = v_rep = None
        q_all = q_loc

    out = ring_attention(q_all, k_loc, v_loc, k_rep, v_rep,
                         hd ** -0.5, axis_name)
    nb = 0 if x_rep is None else x_rep.shape[0]
    out = out.transpose(1, 0, 2).reshape(-1, C)  # (Nb+Ksh, C)
    out = out @ proj_kernel + proj_bias
    if x_rep is None:
        return None, out
    return out[:nb], out[nb:]
