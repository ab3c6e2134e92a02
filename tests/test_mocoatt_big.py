"""MoCoAtt 'all' mode at large K: the queue step must route the 2B+K-token
attention through the streaming path and stay memory-sane + consistent
with the dense module on overlapping sizes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.moma.cmo import CMOHeads
from moma_tpu.moma.queue import QueueState, step_moco_att


def test_attn_fns_big_consistent_with_dense():
    heads = CMOHeads(head="mlp", attn="all", feat_dim=64, s_dim=64, t_dim=64)
    params, _ = heads.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(96, 64).astype(np.float32))
    dense = heads.attn_fns(params, big_n_threshold=10_000)["atts"](x)
    streamed = heads.attn_fns(params, big_n_threshold=16)["atts"](x)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(streamed), atol=3e-4
    )


def test_mocoatt_all_mode_with_large_queue():
    K, D, B = 4096, 64, 16
    heads = CMOHeads(head="mlp", attn="all", feat_dim=D, s_dim=D, t_dim=D)
    params, _ = heads.init(jax.random.PRNGKey(1))
    queue = QueueState.create(jax.random.PRNGKey(2), K, D)
    rs = np.random.RandomState(0)

    def unit(n):
        v = rs.randn(n, D).astype(np.float32)
        return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))

    q, k = unit(B), unit(B)
    fns = heads.attn_fns(params, big_n_threshold=512)
    logits, new_q = step_moco_att(queue, q, k, None, 0.15, "all", fns)
    assert logits.shape == (B, K + 1)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(new_q.ptr) == B
