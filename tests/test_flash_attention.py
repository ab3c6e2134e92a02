"""Streaming attention (chunked jnp + Pallas interface) vs dense
reference on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.ops.flash_attention import batch_token_attention_big, chunked_attention


def _dense(q, k, v, scale):
    s = jnp.einsum("hnd,hmd->hnm", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("hnm,hmd->hnd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("N", [64, 100, 1024])
def test_chunked_matches_dense(N):
    rs = np.random.RandomState(0)
    H, d = 4, 32
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    scale = d**-0.5
    want = _dense(q, k, v, scale)
    got = chunked_attention(q, k, v, scale, chunk=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_batch_token_big_matches_small_module():
    """The streaming path must equal the dense BatchTokenAttention module
    given the same parameters."""
    from moma_tpu.moma.cmo import BatchTokenAttention

    rs = np.random.RandomState(1)
    N, C = 96, 64
    x = jnp.asarray(rs.randn(N, C).astype(np.float32))
    mod = BatchTokenAttention(C, num_heads=4, qkv_bias=True)
    v = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(v, x)
    p = v["params"]
    got = batch_token_attention_big(
        x,
        p["TorchLinear_0"]["kernel"], p["TorchLinear_0"]["bias"],
        p["TorchLinear_1"]["kernel"], p["TorchLinear_1"]["bias"],
        num_heads=4, use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

@pytest.mark.parametrize("N,chunk", [(64, 64), (100, 32), (512, 128)])
def test_streaming_attention_grads_match_dense(N, chunk):
    """The custom flash-attention backward (streaming scans) must produce
    the same (dq, dk, dv) as autodiff of the dense softmax attention.
    This is the gradient path MoCoAtt attn='all'/'dual' training takes
    over 2B+K tokens — the raw pallas_call forward has no autodiff rule
    at all, and scan-autodiff of the chunked forward would materialize
    the full O(N^2) probability matrix."""
    from moma_tpu.ops.flash_attention import streaming_attention

    rs = np.random.RandomState(2)
    H, d = 4, 32
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    scale = d**-0.5
    # non-uniform cotangent so dk/dv are exercised asymmetrically
    w = jnp.asarray(rs.randn(H, N, d).astype(np.float32))

    def loss_stream(q, k, v):
        return jnp.sum(streaming_attention(q, k, v, scale, False, chunk) * w)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, scale) * w)

    got = jax.grad(loss_stream, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, wgrad, name in zip(got, want, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wgrad), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


def test_streaming_attention_grads_bf16_inputs():
    """bf16 q/k/v (the half_precision training path): grads come back in
    the input dtype and match the f32 computation at bf16 tolerance."""
    from moma_tpu.ops.flash_attention import streaming_attention

    rs = np.random.RandomState(3)
    H, N, d = 2, 96, 16
    qf = rs.randn(H, N, d).astype(np.float32)
    kf = rs.randn(H, N, d).astype(np.float32)
    vf = rs.randn(H, N, d).astype(np.float32)
    scale = d**-0.5

    def loss(q, k, v):
        return jnp.sum(streaming_attention(q, k, v, scale, False, 32))

    g_bf = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16),
    )
    g_f32 = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf)
    )
    for gb, gf in zip(g_bf, g_f32):
        assert gb.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gb, np.float32), np.asarray(gf), atol=0.15, rtol=0.1
        )


def test_batch_token_big_is_differentiable():
    """jax.grad through the full big-N attention block (qkv proj included)
    — the exact call the MoMA step makes for attn='all' at large K."""
    rs = np.random.RandomState(4)
    N, C = 96, 64
    x = jnp.asarray(rs.randn(N, C).astype(np.float32))
    kern_qkv = jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) * 0.05)
    bias_qkv = jnp.zeros((3 * C,))
    kern_p = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.05)
    bias_p = jnp.zeros((C,))

    def loss(x, kern_qkv, kern_p):
        out = batch_token_attention_big(
            x, kern_qkv, bias_qkv, kern_p, bias_p, num_heads=4,
            use_pallas=False,
        )
        return jnp.sum(out**2)

    gx, gqkv, gp = jax.grad(loss, argnums=(0, 1, 2))(x, kern_qkv, kern_p)
    # against the dense module path (pure autodiff, no custom vjp)
    from moma_tpu.moma.cmo import BatchTokenAttention

    mod = BatchTokenAttention(C, num_heads=4, qkv_bias=True)
    params = {
        "params": {
            "TorchLinear_0": {"kernel": kern_qkv, "bias": bias_qkv},
            "TorchLinear_1": {"kernel": kern_p, "bias": bias_p},
        }
    }

    def loss_dense(x, kern_qkv, kern_p):
        p2 = jax.tree_util.tree_map(lambda a: a, params)
        p2["params"]["TorchLinear_0"]["kernel"] = kern_qkv
        p2["params"]["TorchLinear_1"]["kernel"] = kern_p
        return jnp.sum(mod.apply(p2, x) ** 2)

    wx, wqkv, wp = jax.grad(loss_dense, argnums=(0, 1, 2))(x, kern_qkv, kern_p)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gqkv), np.asarray(wqkv), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("N,want_bk,want_npad", [
    (16384, 4096, 16384), (16640, 4160, 16640), (17152, 4288, 17152),
    # big-N regime (r5 on-chip, IN-STEP): sub-4096 forward blocks are a
    # Mosaic pathology — N=131328's zero-pad pick (3648, 2304) collapsed
    # the MoCoAtt step to 48.6 img/s; floored at (>=4096, >=2048) the
    # search pads 3 stripes and runs (4128, 2064) at 88.2 img/s
    # (.bench/r5_flash_131328.json, r5_k131072_4128.json)
    (65792, 4128, 66048),
    (131328, 4128, 132096)])
def test_streaming_pallas_block_k_picker(monkeypatch, N, want_bk, want_npad):
    """The Pallas route picks the LARGEST x16-aligned divisor in the
    measured-fast band [1024, 4608] (scripts/tune_flash.py on v5e:
    (256, 4160) runs 2.9x faster than round-2's (256, 256) at N=16640)
    of the minimally-padded key count; block_q stays 256 and both must
    divide the padded N."""
    import moma_tpu.ops.flash_attention as fa

    seen = {}

    def fake_flash(q, k, v, scale, block_q=256, block_k=512, **kw):
        seen["block_q"], seen["block_k"] = block_q, block_k
        seen["nk"] = k.shape[1]
        return fa.chunked_attention(q, k[:, :N], v[:, :N], scale)

    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    q = jnp.zeros((1, N, 8), jnp.float32)
    fa.streaming_attention(q, q, q, 1.0, True)
    assert seen["block_k"] == want_bk
    assert seen["nk"] == want_npad
    assert want_npad % seen["block_q"] == 0 and want_npad % seen["block_k"] == 0
    assert seen["block_k"] % 16 == 0  # bf16 min-tile safe (ADVICE r3)


def test_pick_blocks_pads_primeish_n():
    """Big-N primeish counts take the measured-fast 4096 grid (r5 sweep)
    — padded keys are masked in-kernel; small-N primeish counts still
    go through the minimal-pad joint search."""
    from moma_tpu.ops.flash_attention import pick_blocks

    N = 256 * 641  # 164096; 641 prime — big-N regime
    bq, bk_f, bk_b, npad = pick_blocks(N)
    assert (bq, bk_f, bk_b, npad) == (256, 4128, 2064, 165120)
    assert bk_f >= 4096 and bk_b >= 2048  # big-N floors (r5 measured)
    assert npad % bk_f == 0 and npad % bk_b == 0
    # small-N: minimal-pad joint search unchanged (one 256 stripe)
    n_small = 256 * 107  # 27392; 107 prime, 16*107 = 1712 in bwd band
    bq, bk_f, bk_b, npad = pick_blocks(n_small)
    assert npad % bk_f == 0 and npad % bk_b == 0 and npad >= n_small
    assert bk_f % 16 == 0 and bk_b % 16 == 0 and npad - n_small <= 4096


# ---- round 3: Pallas forward/backward kernels on CPU via interpret mode

def _dense_attn(q, k, v, scale):
    s = jnp.einsum("hnd,hmd->hnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hnm,hmd->hnd", p, v.astype(jnp.float32))


def test_flash_forward_interpret_matches_dense():
    from moma_tpu.ops.flash_attention import _flash_forward

    rs = np.random.RandomState(0)
    H, N, d = 2, 64, 16
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    o, m, l = _flash_forward(q, k, v, d**-0.5, block_q=16, block_k=16,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(o),
                               np.asarray(_dense_attn(q, k, v, d**-0.5)),
                               rtol=2e-5, atol=2e-5)
    # stats consistency: l = sum exp(s - m) rowwise
    s = jnp.einsum("hnd,hmd->hnm", q * d**-0.5, k)
    np.testing.assert_allclose(np.asarray(m[..., 0]),
                               np.asarray(jnp.max(s, -1)), rtol=1e-5)


def test_flash_forward_interpret_padded_mask():
    """Key-padding route: padded k/v columns must contribute exactly
    nothing (in-kernel -inf mask), matching dense over the REAL keys."""
    from moma_tpu.ops.flash_attention import _flash_forward

    rs = np.random.RandomState(1)
    H, N, d, NPAD = 2, 48, 16, 64
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    kp = jnp.pad(k, ((0, 0), (0, NPAD - N), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, NPAD - N), (0, 0)))
    o, _, _ = _flash_forward(q, kp, vp, d**-0.5, block_q=16, block_k=16,
                             n_real=N, interpret=True)
    np.testing.assert_allclose(np.asarray(o),
                               np.asarray(_dense_attn(q, k, v, d**-0.5)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pad", [False, True])
def test_flash_backward_interpret_matches_autodiff(pad):
    """The two-kernel Pallas flash backward == jax.grad of dense
    attention, including the key-padded route."""
    from moma_tpu.ops.flash_attention import _flash_backward, _flash_forward

    rs = np.random.RandomState(2)
    H, N, d = 2, 48, 16
    NPAD = 64 if pad else 48
    scale = d**-0.5
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    w = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    kp = jnp.pad(k, ((0, 0), (0, NPAD - N), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, NPAD - N), (0, 0)))
    n_real = N if pad else None

    o, m, l = _flash_forward(q, kp, vp, scale, block_q=16, block_k=16,
                             n_real=n_real, interpret=True)
    g = w  # cotangent of sum(attn * w)
    dq, dk, dv = _flash_backward(q, kp, vp, o, m, l, g, scale,
                                 block_q=16, block_k=16, n_real=n_real,
                                 interpret=True)

    def loss(q, k, v):
        return jnp.sum(_dense_attn(q, k, v, scale) * w)

    wq, wk, wv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk[:, :N]), np.asarray(wk),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv[:, :N]), np.asarray(wv),
                               rtol=2e-4, atol=2e-5)
    if pad:  # padded rows must receive zero gradient
        assert float(jnp.abs(dk[:, N:]).max()) == 0.0
        assert float(jnp.abs(dv[:, N:]).max()) == 0.0


def test_flash_backward_bf16_dots_interpret():
    """bf16-dot backward (MXU operands bf16, f32 accumulation) stays at
    the bf16-noise scale vs the f32-dot kernels."""
    from moma_tpu.ops.flash_attention import _flash_backward, _flash_forward

    rs = np.random.RandomState(3)
    H, N, d = 2, 64, 16
    scale = d**-0.5
    q = jnp.asarray(rs.randn(H, N, d)).astype(jnp.bfloat16)
    k = jnp.asarray(rs.randn(H, N, d)).astype(jnp.bfloat16)
    v = jnp.asarray(rs.randn(H, N, d)).astype(jnp.bfloat16)
    g = jnp.asarray(rs.randn(H, N, d)).astype(jnp.bfloat16)
    o, m, l = _flash_forward(q, k, v, scale, 16, 16, interpret=True)
    f32 = _flash_backward(q, k, v, o, m, l, g, scale, 16, 16,
                          interpret=True, bf16_dots=False)
    b16 = _flash_backward(q, k, v, o, m, l, g, scale, 16, 16,
                          interpret=True, bf16_dots=True)
    for a, b in zip(b16, f32):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        rel = np.linalg.norm(a32 - b32) / (np.linalg.norm(b32) + 1e-9)
        assert rel < 0.05, rel
