"""Pallas TPU flash attention for the CMO batch-token attention.

The MoCoAtt 'all' mode attends over 2B+K tokens (mem_moco.py:124-126);
with K=16384 the naive (H, N, N) score tensor is ~4 GB — impossible.
This module provides:

  flash_attention      Pallas forward: softmax(QK^T)V with online
                       (streaming) softmax over key blocks, O(N*block)
                       memory, MXU matmuls per tile.  Optionally masks a
                       padded key tail (n_real), enabling LARGE key
                       blocks for any N.
  chunked_attention    pure-jnp lax.scan fallback with the same memory
                       profile (CPU/tests/safety net).
  streaming_attention  the DIFFERENTIABLE entry point (custom VJP).  On
                       the Pallas route BOTH directions are Pallas: the
                       forward also emits the (m, l) softmax stats, and
                       the backward runs the standard two-kernel flash
                       backward (dq streaming over keys; dk/dv streaming
                       over queries) instead of round-1's XLA scans.

Block sizes are MEASURED, not guessed (scripts/tune_flash.py on v5e,
BASELINE.md round 3): at N=16640 the round-2 (bq=256, bk=256) forward
ran 16.4 ms/call while (256, 4160) runs 5.6 ms — block_k wants to be as
large as VMEM allows; the picker takes the largest sublane-aligned
divisor of N in [1024, 4608] and falls back to padding the key axis to
a 2048 multiple with in-kernel masking (exp(-inf)=0 contributions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# bwd uses smaller key blocks than fwd: its per-tile live set (s, p, dp,
# ds at f32) is ~4x the forward's, so cap block_k lower to stay inside
# scoped VMEM.
_FWD_BK_RANGE = (1024, 4608)
_BWD_BK_RANGE = (512, 2304)


def _pick_bk(N: int, lo: int, hi: int):
    """Largest x16-aligned divisor of N in [lo, hi], else None.

    x16 (not x8): the bf16 min tile is (16, 128), so an 8-mod-16 block
    (e.g. the old stride-8 pick 4104 at N=131328) is only legal for f32
    inputs and risks Mosaic pad-copies/lowering failures on bf16.  x16
    is sublane-aligned for both dtypes and barely narrows the band."""
    for bk in range(hi - hi % 16, lo - 1, -16):
        if N % bk == 0:
            return bk
    return None


def pick_blocks(N: int):
    """(block_q, block_k_fwd, block_k_bwd, N_padded) for the Pallas route,
    or None when N doesn't fit the route (odd token counts -> chunked).

    Joint search: the smallest key padding npad >= N (stepped by bq)
    for which BOTH the forward and backward bands contain
    a x16 divisor of npad.  npad == N (no padding) is the first candidate,
    so exactly-divisible Ns keep their tuned zero-copy blocks; prime-ish
    Ns (giant-K territory) pad by as little as one 256 stripe instead of
    the old fixed pad-to-2048 with locked 2048/2048 blocks — e.g.
    N=65792 (K=65536) pads 256 keys and runs (4128, 2064) instead of
    falling back.  Padded columns are masked in-kernel (exp(-inf)=0)."""
    if N % 256 == 0:
        bq = 256
    elif N % 128 == 0:
        bq = 128
    else:
        return None
    # The minimal-pad pick is kept only when its forward block reaches
    # 4096 — r5 on-chip evidence (IN-STEP, the only trustworthy compare
    # on the relay): N=16640 (bk 4160) and N=65792 (bk 4128, one-stripe
    # pad) run 484 / 231.9 img/s, but N=131328's zero-pad pick (bk 3648)
    # collapsed the step to 48.6 img/s — its standalone forward measured
    # 1848 ms vs 708 ms for a plain (4096, 2048) grid padded to the next
    # 4096 multiple (scripts/tune_flash_bigN.py, .bench/r5_flash_
    # 131328.json), and the 4096 grid restored the step to 86.2 img/s.
    # Sub-4096 forward blocks on big N are a measured Mosaic pathology;
    # ~3% padded keys are cheap by comparison.
    # (Only above 32768 tokens: small Ns keep their exact small blocks —
    # padding a 2048-token case to a 4096 grid would double its work.)
    # the backward equally dislikes small key blocks (sweep: bk_b 1024
    # cost +21% grad vs 2048 at N=65792), so floor it at 2048 too
    min_bk_f = 4096 if N > 32768 else _FWD_BK_RANGE[0]
    min_bk_b = 2048 if N > 32768 else _BWD_BK_RANGE[0]
    for npad in range(N, N + 16 * 2048 + 1, bq):
        bk_f = _pick_bk(npad, *_FWD_BK_RANGE)
        bk_b = _pick_bk(npad, *_BWD_BK_RANGE)
        if (bk_f is not None and bk_f >= min_bk_f
                and bk_b is not None and bk_b >= min_bk_b):
            return bq, bk_f, bk_b, npad
    npad = -(-N // 4096) * 4096
    return bq, 4096, 2048, npad


def _mask_cols(s, kb, block_k, n_real):
    """Mask score columns whose global key index exceeds the real count."""
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < n_real, s, NEG_INF)


# ------------------------------------------------------------- forward

def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref,
                      acc_ref, m_ref, l_ref, *, block_k, n_real):
    """Grid (H, num_q_blocks, num_k_blocks); k innermost for streaming."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d), pre-scaled
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    if n_real is not None:
        s = _mask_cols(s, kb, block_k, n_real)

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
        m_out_ref[0] = m_ref[:]
        l_out_ref[0] = l_ref[:]


def _flash_forward(q, k, v, scale, block_q, block_k, n_real=None,
                   interpret=False):
    """Returns (o, m, l); k/v may be key-padded beyond q's N (mask via
    n_real).  q is scaled here (input dtype, like round-1)."""
    H, N, d = q.shape
    Nk = k.shape[1]
    assert N % block_q == 0 and Nk % block_k == 0, (N, Nk, block_q, block_k)
    q = q * scale
    grid = (H, N // block_q, Nk // block_k)
    kern = functools.partial(_flash_fwd_kernel, block_k=block_k,
                             n_real=n_real)
    o, m, l = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, d), q.dtype),
            jax.ShapeDtypeStruct((H, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, m, l


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int = 256, block_k: int = 512, n_real=None, interpret=False,
) -> jax.Array:
    """softmax(scale * q @ k^T) @ v for (H, N, d) inputs, streaming over k.

    N must be a multiple of the block sizes.  k/v may carry a padded key
    tail (pass `n_real` = the true key count; padded columns are masked
    to exp(-inf) = 0 inside the kernel)."""
    o, _, _ = _flash_forward(q, k, v, scale, block_q, block_k,
                             n_real=n_real, interpret=interpret)
    return o


# ------------------------------------------------------------ backward

def _flash_dq_kernel(qs_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dl_ref,
                     dq_ref, acc_ref, *, block_k, n_real, bf16_dots):
    """dq = sum_j ds_ij @ k_j; grid (H, Ni, Nj), j innermost.

    bf16_dots (DEFAULT): keep the MXU dot operands in the input dtype
    (f32 accumulation, like the forward's p @ v).  Measured on chip:
    BIT-IDENTICAL grads to the f32-cast variant on bf16 inputs — JAX's
    default matmul precision rounds f32 MXU operands to bf16 anyway, so
    the f32 casts only added VMEM copies (73.97 -> 16.26 ms/call at
    N=16640, 4.5x) — BASELINE.md round 3."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)
    dot_t = (lambda a: a) if bf16_dots else (
        lambda a: a.astype(jnp.float32))

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qs = dot_t(qs_ref[0])
    k = dot_t(k_ref[0])
    v = dot_t(v_ref[0])
    do = dot_t(do_ref[0])
    s = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)
    if n_real is not None:
        s = _mask_cols(s, kb, block_k, n_real)
    p = jnp.exp(s - m_ref[0]) / l_ref[0]
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0])
    acc_ref[:] += jnp.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _finish():
        dq_ref[0] = acc_ref[:]


def _flash_dkv_kernel(qs_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dl_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc, *, block_k, n_real,
                      bf16_dots):
    """dv = sum_i p_ij^T @ dO_i; dk = sum_i ds_ij^T @ qs_i.
    Grid (H, Nj, Ni), i (queries) innermost."""
    ib = pl.program_id(2)
    nib = pl.num_programs(2)
    kb = pl.program_id(1)
    dot_t = (lambda a: a) if bf16_dots else (
        lambda a: a.astype(jnp.float32))

    @pl.when(ib == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qs = dot_t(qs_ref[0])
    k = dot_t(k_ref[0])
    v = dot_t(v_ref[0])
    do = dot_t(do_ref[0])
    s = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    if n_real is not None:
        s = _mask_cols(s, kb, block_k, n_real)
    p = jnp.exp(s - m_ref[0]) / l_ref[0]
    # contract over the query axis without materialized transposes
    dim_q = (((0,), (0,)), ((), ()))
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, dim_q,
        preferred_element_type=jnp.float32)                 # (bk, d)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(qs.dtype), qs, dim_q,
        preferred_element_type=jnp.float32)                 # (bk, d)

    @pl.when(ib == nib - 1)
    def _finish():
        dk_ref[0] = dk_acc[:]
        dv_ref[0] = dv_acc[:]


def _flash_backward(q, k, v, o, m, l, g, scale, block_q, block_k,
                    n_real=None, interpret=False, bf16_dots=True):
    """Exact flash backward as two Pallas kernels.  k/v (and the returned
    dk/dv) may be key-padded; the caller slices."""
    H, N, d = q.shape
    Nk = k.shape[1]
    qs = q * scale  # matches the forward's scaling point
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (H, N, 1)

    row_spec = pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0))
    key_spec = pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0))
    stat_spec = pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0))
    dqs = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=block_k, n_real=n_real,
                          bf16_dots=bf16_dots),
        grid=(H, N // block_q, Nk // block_k),
        in_specs=[row_spec, key_spec, key_spec, row_spec,
                  stat_spec, stat_spec, stat_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((H, N, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qs, k, v, g, m, l, delta)
    dq = (dqs * scale).astype(q.dtype)

    # dk/dv: key blocks outer, query blocks inner
    row_spec2 = pl.BlockSpec((1, block_q, d), lambda h, j, i: (h, i, 0))
    key_spec2 = pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0))
    stat_spec2 = pl.BlockSpec((1, block_q, 1), lambda h, j, i: (h, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_k=block_k, n_real=n_real,
                          bf16_dots=bf16_dots),
        grid=(H, Nk // block_k, N // block_q),
        in_specs=[row_spec2, key_spec2, key_spec2, row_spec2,
                  stat_spec2, stat_spec2, stat_spec2],
        out_specs=[key_spec2, key_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((H, Nk, d), jnp.float32),
            jax.ShapeDtypeStruct((H, Nk, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
    )(qs, k, v, g, m, l, delta)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------- chunked fallback

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


# ------------------------------------------------- differentiable entry

def _pallas_route(N: int, use_pallas: bool):
    return pick_blocks(N) if use_pallas else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def streaming_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    use_pallas: bool = False, chunk: int = 1024,
) -> jax.Array:
    """Differentiable streaming attention.

    Neither raw forward is differentiable at scale: `pallas_call` has no
    autodiff rule at all (jax.grad through `flash_attention` raises —
    MoCoAtt attn='all'/'dual' training over 2B+K tokens hits the Pallas
    path on TPU with gradients flowing into q and the attention weights,
    mem_moco.py:110-161), and scan-autodiff of `chunked_attention` saves
    every per-chunk (H, N, chunk) probability tile — the full O(N^2)
    score matrix flash attention exists to avoid.  The custom VJP:
    Pallas route = flash forward (saving its (m, l) stats) + the
    two-kernel Pallas flash backward; chunked route = one cheap stats
    pass + streaming scans.  O(N·block) memory both ways."""
    route = _pallas_route(q.shape[1], use_pallas)
    if route is not None:
        bq, bk_f, _, npad = route
        N = q.shape[1]
        if npad != N:
            k = jnp.pad(k, ((0, 0), (0, npad - N), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, npad - N), (0, 0)))
        return flash_attention(q, k, v, scale, block_q=bq, block_k=bk_f,
                               n_real=N if npad != N else None)
    return chunked_attention(q, k, v, scale, chunk)


def _streaming_attention_fwd(q, k, v, scale, use_pallas, chunk):
    route = _pallas_route(q.shape[1], use_pallas)
    if route is not None:
        bq, bk_f, _, npad = route
        N = q.shape[1]
        kp, vp = k, v
        if npad != N:
            kp = jnp.pad(k, ((0, 0), (0, npad - N), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, npad - N), (0, 0)))
        o, m, l = _flash_forward(q, kp, vp, scale, bq, bk_f,
                                 n_real=N if npad != N else None)
        return o, (q, k, v, o, m, l)
    return streaming_attention(q, k, v, scale, use_pallas, chunk), (
        q, k, v, None, None, None)


def _streaming_attention_bwd(scale, use_pallas, chunk, res, g):
    q, k, v, o, m, l = res
    route = _pallas_route(q.shape[1], use_pallas)
    if route is not None:
        bq, _, bk_b, npad = route
        N = q.shape[1]
        kp, vp = k, v
        if npad != N:
            kp = jnp.pad(k, ((0, 0), (0, npad - N), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, npad - N), (0, 0)))
        dq, dk, dv = _flash_backward(
            q, kp, vp, o, m, l, g, scale, bq, bk_b,
            n_real=N if npad != N else None,
        )
        return dq, dk[:, :N], dv[:, :N]

    # chunked route: rebuild (o, m, l) with one cheap stats pass, then
    # exact streaming backward as scans
    qs = q.astype(jnp.float32) * scale
    g32 = g.astype(jnp.float32)
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
