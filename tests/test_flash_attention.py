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
