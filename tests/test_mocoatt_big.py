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


def test_mocoatt_all_mode_gradients_streamed_vs_dense():
    """Training gradients through the 2B+K streamed attention must match
    the dense-module path.  Before streaming_attention's custom VJP the
    big-N route was NOT differentiable at all (pallas_call has no
    autodiff rule; the chunked scan's autodiff re-materializes O(N^2)) —
    i.e. `run_moma --attn all` at real K crashed on TPU."""
    K, D, B = 1024, 64, 8
    heads = CMOHeads(head="mlp", attn="all", feat_dim=D, s_dim=D, t_dim=D)
    params, _ = heads.init(jax.random.PRNGKey(1))
    queue = QueueState.create(jax.random.PRNGKey(2), K, D)
    rs = np.random.RandomState(3)

    def unit(n):
        v = rs.randn(n, D).astype(np.float32)
        return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))

    q, k = unit(B), unit(B)

    def loss(params, q, thresh):
        fns = heads.attn_fns(params, big_n_threshold=thresh)
        logits, _ = step_moco_att(queue, q, k, None, 0.15, "all", fns)
        # contrast CE with the positive at column 0 (loops_moma contract)
        return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

    # threshold above 2B+K -> dense module (pure autodiff);
    # tiny threshold -> streaming path (custom VJP)
    (gp_d, gq_d) = jax.grad(loss, argnums=(0, 1))(params, q, 10_000)
    (gp_s, gq_s) = jax.grad(loss, argnums=(0, 1))(params, q, 64)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_d),
                               atol=2e-5, rtol=1e-3)
    flat_d = jax.tree_util.tree_leaves_with_path(gp_d)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gp_s))
    for path, leaf_d in flat_d:
        leaf_s = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_d), atol=3e-5, rtol=2e-3,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )
