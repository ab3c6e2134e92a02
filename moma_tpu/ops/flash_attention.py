"""Pallas TPU flash attention for the CMO batch-token attention.

The MoCoAtt 'all' mode attends over 2B+K tokens (mem_moco.py:124-126);
with K=16384 the naive (H, N, N) score tensor is ~4 GB — impossible.
This kernel computes softmax(QK^T)V with online (streaming) softmax over
key blocks: O(N * block) memory, MXU matmuls per tile.

Layout: single sequence (the token axis IS the batch+queue), multi-head:
    q, k, v: (H, N, d)  ->  out: (H, N, d)

Also exposes `chunked_attention`, a pure-jnp lax.scan fallback with the
same memory profile, used on CPU (tests) and as a safety net.
"""

from __future__ import annotations

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


def chunked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    chunk: int = 1024,
) -> jax.Array:
    """Pure-jnp streaming attention (same math, lax.scan over key chunks);
    used on CPU and as the non-Pallas fallback."""
    H, N, d = q.shape
    qs = q.astype(jnp.float32) * scale
    pad = (-N) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kc = k.reshape(H, -1, chunk, d).transpose(1, 0, 2, 3)
    vc = v.reshape(H, -1, chunk, d).transpose(1, 0, 2, 3)
    n_chunks = kc.shape[0]
    valid = jnp.arange(n_chunks * chunk).reshape(n_chunks, chunk) < N

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
    return (acc / l).astype(q.dtype)


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
    if use_pallas and N % 256 == 0:
        out = flash_attention(q, k, v, scale)
    else:
        out = chunked_attention(q, k, v, scale)
    out = out.transpose(1, 0, 2).reshape(N, C)
    return out @ proj_kernel + proj_bias
