"""Pallas TPU flash attention for the CMO batch-token attention.

The MoCoAtt 'all' mode attends over 2B+K tokens (mem_moco.py:124-126);
with K=16384 the naive (H, N, N) score tensor is ~4 GB — impossible.
This kernel computes softmax(QK^T)V with online (streaming) softmax over
key blocks: O(N * block) memory, MXU matmuls per tile.

Layout: single sequence (the token axis IS the batch+queue), multi-head:
    q, k, v: (H, N, d)  ->  out: (H, N, d)

Also exposes `chunked_attention`, a pure-jnp lax.scan fallback with the
same memory profile, used on CPU (tests) and as a safety net, and
`streaming_attention`, the DIFFERENTIABLE entry point (custom VJP with
an exact flash-attention backward as streaming scans) that training
code must use — raw pallas_call has no autodiff rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
    """Grid (H, num_q_blocks, num_k_blocks); k innermost for streaming."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)

    m_prev = m_ref[:]  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(kb == nkb - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int = 256, block_k: int = 512,
) -> jax.Array:
    """softmax(scale * q @ k^T) @ v for (H, N, d) inputs, streaming over k.

    N must be a multiple of the block sizes (pad upstream; the CMO caller
    pads tokens with -inf masking unnecessary because every token is real).
    """
    H, N, d = q.shape
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    q = q * scale
    grid = (H, N // block_q, N // block_k)
    return pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, N, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )(q, k, v)


def _chunk_kv(k: jax.Array, v: jax.Array, chunk: int):
    """Pad the key axis to a chunk multiple and split into scan slices."""
    H, N, d = k.shape
    pad = (-N) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kc = k.reshape(H, -1, chunk, d).transpose(1, 0, 2, 3)
    vc = v.reshape(H, -1, chunk, d).transpose(1, 0, 2, 3)
    n_chunks = kc.shape[0]
    valid = jnp.arange(n_chunks * chunk).reshape(n_chunks, chunk) < N
    return kc, vc, valid


def _forward_stats(qs: jax.Array, k: jax.Array, v: jax.Array, chunk: int):
    """Streaming softmax(qs @ k^T) @ v with the row stats kept.

    qs is PRE-SCALED f32.  Returns (o, m, l) all f32 — o the attention
    output, m the row max, l the row partition sum — which is exactly
    what the flash-attention backward needs to rebuild each probability
    tile without materializing the (N, N) score matrix."""
    H, N, d = qs.shape
    kc, vc, valid = _chunk_kv(k, v, chunk)

    def body(carry, xs):
        m, l, acc = carry
        k_i, v_i, valid_i = xs
        s = jnp.einsum("hnd,hcd->hnc", qs, k_i.astype(jnp.float32))
        s = jnp.where(valid_i[None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("hnc,hcd->hnd", p, v_i.astype(jnp.float32))
        return (m_new, l, acc), None

    init = (
        jnp.full((H, N, 1), NEG_INF, jnp.float32),
        jnp.zeros((H, N, 1), jnp.float32),
        jnp.zeros((H, N, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (kc, vc, valid))
    return acc / l, m, l


def chunked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    chunk: int = 1024,
) -> jax.Array:
    """Pure-jnp streaming attention (same math, lax.scan over key chunks);
    used on CPU and as the non-Pallas fallback."""
    qs = q.astype(jnp.float32) * scale
    o, _, _ = _forward_stats(qs, k, v, chunk)
    return o.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def streaming_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    use_pallas: bool = False, chunk: int = 1024,
) -> jax.Array:
    """Differentiable streaming attention: flash/chunked forward + an
    exact flash-attention BACKWARD written as streaming scans.

    Neither raw forward is differentiable at scale: `pallas_call` has no
    autodiff rule at all (so jax.grad through `flash_attention` raises —
    the bug this wrapper fixes: MoCoAtt attn='all'/'dual' training over
    2B+K tokens hits the Pallas path on TPU with gradients flowing into
    q and the attention weights, mem_moco.py:110-161), and scan-autodiff
    of `chunked_attention` saves every per-chunk (H, N, chunk)
    probability tile — the full O(N^2) score matrix flash attention
    exists to avoid.  The custom VJP recomputes each tile from the saved
    (q, k, v) plus one cheap stats pass: O(N·chunk) memory both ways."""
    N = q.shape[1]
    if use_pallas and N % 256 == 0:
        # block_k must also divide N: the MoCoAtt 'all' token count
        # 2B+K is a 256-multiple but not always a 512-multiple
        # (BS128 + K=16384 -> 16640 = 65*256)
        return flash_attention(
            q, k, v, scale, block_k=512 if N % 512 == 0 else 256
        )
    return chunked_attention(q, k, v, scale, chunk)


def _streaming_attention_fwd(q, k, v, scale, use_pallas, chunk):
    return streaming_attention(q, k, v, scale, use_pallas, chunk), (q, k, v)


def _streaming_attention_bwd(scale, use_pallas, chunk, res, g):
    q, k, v = res
    qs = q.astype(jnp.float32) * scale
    g32 = g.astype(jnp.float32)
    # one streaming pass rebuilds (o, m, l); materializing nothing bigger
    # than an (H, N, chunk) tile
    o, m, l = _forward_stats(qs, k, v, chunk)
    delta = jnp.sum(g32 * o, axis=-1, keepdims=True)  # (H, N, 1)
    kc, vc, valid = _chunk_kv(k, v, chunk)

    def body(dqs, xs):
        k_i, v_i, valid_i = xs
        k32 = k_i.astype(jnp.float32)
        s = jnp.einsum("hnd,hcd->hnc", qs, k32)
        s = jnp.where(valid_i[None, None, :], s, NEG_INF)
        p = jnp.exp(s - m) / l  # exact softmax tile (padded cols -> 0)
        dv_i = jnp.einsum("hnc,hnd->hcd", p, g32)
        dp = jnp.einsum("hnd,hcd->hnc", g32, v_i.astype(jnp.float32))
        ds = p * (dp - delta)
        dqs = dqs + jnp.einsum("hnc,hcd->hnd", ds, k32)
        dk_i = jnp.einsum("hnc,hnd->hcd", ds, qs)
        return dqs, (dk_i, dv_i)

    dqs0 = jnp.zeros_like(qs)
    dqs, (dkc, dvc) = jax.lax.scan(body, dqs0, (kc, vc, valid))
    H, N, d = q.shape
    dk = dkc.transpose(1, 0, 2, 3).reshape(H, -1, d)[:, :N]
    dv = dvc.transpose(1, 0, 2, 3).reshape(H, -1, d)[:, :N]
    return (
        (dqs * scale).astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


streaming_attention.defvjp(_streaming_attention_fwd, _streaming_attention_bwd)


def batch_token_attention_big(
    x: jax.Array, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
    num_heads: int, use_pallas: bool | None = None,
) -> jax.Array:
    """Drop-in big-N path for moma_tpu.moma.cmo.BatchTokenAttention:
    (N, C) tokens -> (N, C), streaming attention."""
    N, C = x.shape
    H = num_heads
    hd = C // H
    qkv = x @ qkv_kernel
    if qkv_bias is not None:
        qkv = qkv + qkv_bias
    qkv = qkv.reshape(N, 3, H, hd).transpose(1, 2, 0, 3)  # (3, H, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    scale = hd**-0.5
    out = streaming_attention(q, k, v, scale, use_pallas)
    out = out.transpose(1, 0, 2).reshape(N, C)
    return out @ proj_kernel + proj_bias
