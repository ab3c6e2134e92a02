"""Ring flash attention for the CMO batch-token attention over a
'model'-sharded token set.

Built for the MoCoAtt queue-consuming modes under a sharded negative
bank (mem_moco.py:124-161 attend over [q; k; queue] = 2B+K tokens):
round 4's `step_moco_att_sharded` all-gathered the (K, D) bank per
device before attending — re-materializing exactly the array the
sharding exists to split (VERDICT r4 weak #5).  This module attends
WITHOUT ever holding the full bank (raw OR transformed) on any device:

  tokens   = [replicated batch block (Nb rows)] + [sharded rows, Ksh/dev]
  queries  = the local tokens (Nb + Ksh)
  keys     = ALL tokens — the replicated block locally (counted once),
             the sharded rows by circulating each device's (Ksh, d)
             key/value shard around the model axis (lax.ppermute),
             flash-accumulating online-softmax stats (m, l, acc) per hop

Memory: O(Nb + 2*Ksh) token rows resident per device (local shard + one
in-flight shard).  Communication: mp-1 ppermute hops forward, mp hops
backward — the standard ring-attention schedule (Liu & Abbeel 2023,
arXiv:2310.01889; reimplemented from the schedule, adapted to the
replicated+sharded token split).

WHY A CUSTOM VJP.  (1) Naive autodiff of the forward scan would save
every circulated K/V shard (= the full projected bank) for the
backward; the backward here RE-circulates instead — pass 1 handles the
replicated batch keys locally, pass 2 sends the QUERY-side block
(q, do, m, l, delta, travelling dq) around the ring while the key
shards stay home, each hop depositing into the local shard's dk/dv.
Probabilities are rebuilt from the FINAL (m, l), which is exact
regardless of accumulation order, so no per-hop stats are stored.
(2) Gradient replication: the surrounding sharded MoMA step pmean's
gradients over 'data' ONLY — every model rank must leave the step with
the IDENTICAL full parameter gradient (the state is replicated over
'model').  Contributions that flow through the sharded rows are
rank-varying, so this VJP psums them over the model axis internally:

    dWqkv = x_rep^T ct(qkv_rep)            [replicated-identical]
          + psum_model(x_loc^T ct(qkv_loc))  [shard contributions]

and likewise for the out-projection, biases, and the batch block's
k/v cotangents (which receive contributions from every rank's queue
queries).  Cotangent CONVENTION at the call boundary: ct(out_rep) must
arrive replicated-identical and already-full (the standard consumption:
pos logits + _grad_psum'd neg logits); ct(out_loc) must arrive as the
TRUE per-shard cotangent of a single global loss (an all-gather
consumer divides its mp-summed cotangent by mp — see
queue.sharded_queue_logits_t).

NUMERICS: f32 stats/accumulators; matmuls in the input dtype (the TPU
MXU rounds f32 operands to bf16 anyway — CLAUDE.md session-19).  Ranks
visit shards in rotated orders, so per-rank results agree only to fp
reassociation; the caller pmean's grads over 'model' to keep replicated
state bit-identical across ranks (train/moma.py ring path).

Parity oracle: tests/test_ring_attention.py (dense single-device
softmax + the replicated-step MoMA oracle).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _flash_update(carry, q32, k, v):
    """One online-softmax accumulation of pre-scaled f32 queries
    q32 (H, Nq, d) against a key/value block (H, Nc, d)."""
    m, l, acc = carry
    s = jnp.einsum("hnd,hcd->hnc", q32, k.astype(jnp.float32))
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum("hnc,hcd->hnd", p, v.astype(jnp.float32))
    return m_new, l, acc


def _ring_forward(q32, kq, vq, kb, vb, axis_name, mp):
    """(o32, m, l) for the local queries; kb/vb may be zero-width."""
    H, nq, d = q32.shape
    carry = (
        jnp.full((H, nq, 1), NEG_INF, jnp.float32),
        jnp.zeros((H, nq, 1), jnp.float32),
        jnp.zeros((H, nq, d), jnp.float32),
    )
    if kb.shape[1]:
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


def _tile_grads(q32, k, v, do32, m, l, delta, row_scale=None):
    """Exact softmax tile of q32 vs one key block -> (dq, dk, dv).

    q32 is PRE-SCALED (s = q32 @ k^T), so dk = ds^T @ q32 already equals
    the true scale * ds^T @ Q; only dq (computed against the unscaled k)
    still needs the caller's single * scale.

    row_scale (1, Nq, 1), optional: per-QUERY-row weight applied to the
    dk/dv products only (dq is always unscaled).  Used by the ring
    backward to down-weight replicated query rows whose deposits into a
    key shard would otherwise be counted once per visiting rank."""
    k32 = k.astype(jnp.float32)
    s = jnp.einsum("hnd,hcd->hnc", q32, k32)
    p = jnp.exp(s - m) / l
    dp = jnp.einsum("hnd,hcd->hnc", do32, v.astype(jnp.float32))
    ds = p * (dp - delta)
    dq = jnp.einsum("hnc,hcd->hnd", ds, k32)
    if row_scale is not None:
        p = p * row_scale
        ds = ds * row_scale
    dv = jnp.einsum("hnc,hnd->hcd", p, do32)
    dk = jnp.einsum("hnc,hnd->hcd", ds, q32)
    return dq, dk, dv


def _split_heads(qkv, n, H, hd):
    qkv = qkv.reshape(n, 3, H, hd).transpose(1, 2, 0, 3)  # (3, H, n, hd)
    return qkv[0], qkv[1], qkv[2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ring_batch_token_attention(
    x_rep: jax.Array,
    x_loc: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: Optional[jax.Array],
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    num_heads: int,
    axis_name: str,
) -> Tuple[jax.Array, jax.Array]:
    """BatchTokenAttention (cmo.py:28-58 numerics) over the token set
    [x_rep (replicated, Nb rows — may be zero-width); x_loc sharded over
    `axis_name` (Ksh rows/device)].  Returns (out_rep, out_loc); out_loc
    stays sharded.  Differentiable in all array args."""
    out, _ = _rbta_fwd_impl(x_rep, x_loc, qkv_kernel, qkv_bias,
                            proj_kernel, proj_bias, num_heads, axis_name)
    return out


def _rbta_fwd_impl(x_rep, x_loc, qkv_kernel, qkv_bias, proj_kernel,
                   proj_bias, num_heads, axis_name):
    mp = jax.lax.psum(1, axis_name)
    nb, C = x_rep.shape
    H, hd = num_heads, x_loc.shape[-1] // num_heads
    scale = hd ** -0.5

    def project(x):
        qkv = x @ qkv_kernel
        if qkv_bias is not None:
            qkv = qkv + qkv_bias
        return _split_heads(qkv, x.shape[0], H, hd)

    q_rep, k_rep, v_rep = project(x_rep)
    q_loc, k_loc, v_loc = project(x_loc)
    Q = jnp.concatenate([q_rep, q_loc], axis=1)  # (H, Nb+Ksh, hd)
    q32 = Q.astype(jnp.float32) * scale
    o32, m, l = _ring_forward(q32, k_loc, v_loc, k_rep, v_rep,
                              axis_name, mp)
    y = o32.astype(x_loc.dtype).transpose(1, 0, 2).reshape(-1, C)
    out = y @ proj_kernel + proj_bias
    res = (x_rep, x_loc, qkv_kernel, qkv_bias, proj_kernel,
           q32, k_rep, v_rep, k_loc, v_loc, o32, m, l, y)
    return (out[:nb], out[nb:]), res


def _rbta_fwd(x_rep, x_loc, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
              num_heads, axis_name):
    return _rbta_fwd_impl(x_rep, x_loc, qkv_kernel, qkv_bias, proj_kernel,
                          proj_bias, num_heads, axis_name)


def _rbta_bwd(num_heads, axis_name, res, g):
    (x_rep, x_loc, qkv_kernel, qkv_bias, proj_kernel,
     q32, k_rep, v_rep, k_loc, v_loc, o32, m, l, y) = res
    g_rep, g_loc = g
    mp = jax.lax.psum(1, axis_name)
    nb, C = x_rep.shape
    Ksh = x_loc.shape[0]
    H, hd = num_heads, C // num_heads
    scale = hd ** -0.5

    def psum(t):
        return jax.lax.psum(t, axis_name)

    # ---- out-projection.  Shard-row contributions psum'd so every rank
    # holds the identical full parameter gradient (see module docstring).
    d_proj_kernel = (y[:nb].T @ g_rep) + psum(y[nb:].T @ g_loc)
    d_proj_bias = jnp.sum(g_rep, axis=0) + psum(jnp.sum(g_loc, axis=0))
    dy = jnp.concatenate([g_rep, g_loc], axis=0) @ proj_kernel.T  # (Nq, C)
    do32 = dy.reshape(-1, H, hd).transpose(1, 0, 2).astype(jnp.float32)
    delta = jnp.sum(do32 * o32, axis=-1, keepdims=True)  # (H, Nq, 1)

    # ---- attention core.  pass 1: replicated batch keys — split the
    # query groups so the rank-varying (queue-query) contribution to the
    # batch block's dk/dv can be psum'd while the batch-query part
    # (identical on every rank) counts once.
    dq_b = jnp.zeros_like(q32)
    if nb:
        dq_rep_b, dkb_rep, dvb_rep = _tile_grads(
            q32[:, :nb], k_rep, v_rep, do32[:, :nb], m[:, :nb], l[:, :nb],
            delta[:, :nb])
        dq_loc_b, dkb_locq, dvb_locq = _tile_grads(
            q32[:, nb:], k_rep, v_rep, do32[:, nb:], m[:, nb:], l[:, nb:],
            delta[:, nb:])
        dkb = dkb_rep + psum(dkb_locq)
        dvb = dvb_rep + psum(dvb_locq)
        dq_b = jnp.concatenate([dq_rep_b, dq_loc_b], axis=1)
    else:
        dkb = jnp.zeros_like(k_rep.astype(jnp.float32))
        dvb = jnp.zeros_like(dkb)

    # pass 2: ring — the query block travels, key shards stay home.  The
    # +1 shift pairs every (query block, key shard) exactly once over mp
    # hops and brings the block home with its accumulated dq.  Every
    # rank's block carries the SAME replicated batch-query rows, so
    # their deposits into a key shard would be counted mp times —
    # down-weight those rows by 1/mp in the dk/dv products (dq is the
    # block-owner's own gradient and stays unscaled).
    perm = [(i, (i + 1) % mp) for i in range(mp)]
    dkq = jnp.zeros((H, Ksh, hd), jnp.float32)
    dvq = jnp.zeros((H, Ksh, hd), jnp.float32)
    nq = q32.shape[1]
    row_scale = jnp.where(jnp.arange(nq)[None, :, None] < nb,
                          1.0 / mp, 1.0)

    def body(state, _):
        blk, dkq, dvq = state
        b_q32, b_do, b_m, b_l, b_delta, b_dq = blk
        dq_c, dk_c, dv_c = _tile_grads(b_q32, k_loc, v_loc, b_do, b_m,
                                       b_l, b_delta, row_scale=row_scale)
        blk = (b_q32, b_do, b_m, b_l, b_delta, b_dq + dq_c)
        blk = jax.lax.ppermute(blk, axis_name, perm)
        return (blk, dkq + dk_c, dvq + dv_c), None

    init_blk = (q32, do32, m, l, delta, jnp.zeros_like(q32))
    ((_, _, _, _, _, dq_travel), dkq, dvq), _ = jax.lax.scan(
        body, (init_blk, dkq, dvq), None, length=mp)

    dQ = (dq_b + dq_travel) * scale  # (H, Nq, hd) f32

    # ---- reassemble qkv cotangents and push through the projection.
    def merge_heads(dq, dk, dv, n):
        stacked = jnp.stack([dq, dk, dv])             # (3, H, n, hd)
        return stacked.transpose(2, 0, 1, 3).reshape(n, 3 * C)

    ct_qkv_rep = merge_heads(dQ[:, :nb], dkb, dvb, nb)
    ct_qkv_loc = merge_heads(dQ[:, nb:], dkq, dvq, Ksh)
    ct_qkv_rep = ct_qkv_rep.astype(x_rep.dtype)
    ct_qkv_loc = ct_qkv_loc.astype(x_loc.dtype)
    d_qkv_kernel = (x_rep.T @ ct_qkv_rep) + psum(x_loc.T @ ct_qkv_loc)
    d_qkv_bias = (
        jnp.sum(ct_qkv_rep, axis=0) + psum(jnp.sum(ct_qkv_loc, axis=0))
        if qkv_bias is not None else None
    )
    d_x_rep = ct_qkv_rep @ qkv_kernel.T
    d_x_loc = ct_qkv_loc @ qkv_kernel.T
    return (d_x_rep, d_x_loc, d_qkv_kernel, d_qkv_bias,
            d_proj_kernel, d_proj_bias)


ring_batch_token_attention.defvjp(_rbta_fwd, _rbta_bwd)
