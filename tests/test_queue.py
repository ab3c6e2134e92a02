"""MoCo queue state-machine tests: pointer wraparound, read-before-write
ordering, logits layout — the invariants called out in SURVEY.md §4(c)
(reference mem_moco.py:14-27, 89-99)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.moma.queue import (
    QueueState,
    contrast_ce,
    queue_logits,
    queue_update,
    step_moco,
    step_moco_st,
)


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_create_normalized():
    q = QueueState.create(jax.random.PRNGKey(0), K=32, n_dim=8)
    norms = jnp.linalg.norm(q.memory["memory"], axis=1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    assert int(q.ptr) == 0


def test_pointer_wraparound_and_fmod_write():
    q = QueueState.create(jax.random.PRNGKey(0), K=8, n_dim=4)
    keys1 = jnp.asarray(np.arange(24, dtype=np.float32).reshape(6, 4))
    q = queue_update(q, {"memory": keys1})
    assert int(q.ptr) == 6
    # next write of 6 rows wraps: rows 6,7 then 0..3 (fmod semantics)
    keys2 = -jnp.ones((6, 4))
    q = queue_update(q, {"memory": keys2})
    assert int(q.ptr) == (6 + 6) % 8  # == 4
    mem = np.asarray(q.memory["memory"])
    np.testing.assert_allclose(mem[6], -1.0)
    np.testing.assert_allclose(mem[7], -1.0)
    np.testing.assert_allclose(mem[0], -1.0)
    np.testing.assert_allclose(mem[3], -1.0)
    # rows 4,5 still from keys1
    np.testing.assert_allclose(mem[4], keys1[4])
    np.testing.assert_allclose(mem[5], keys1[5])


def test_read_before_write_ordering():
    """Logits must come from the PRE-update queue (mem_moco.py:89-99)."""
    q = QueueState.create(jax.random.PRNGKey(1), K=16, n_dim=4)
    pre_mem = np.asarray(q.memory["memory"]).copy()
    qq = jnp.asarray(_norm_rows(np.random.RandomState(0).randn(3, 4)).astype(np.float32))
    kk = jnp.asarray(_norm_rows(np.random.RandomState(1).randn(3, 4)).astype(np.float32))
    logits, new_q = step_moco(q, qq, kk, None, T=0.07)
    # negative block must equal q @ pre_mem.T / T
    want_neg = np.asarray(qq) @ pre_mem.T / 0.07
    np.testing.assert_allclose(np.asarray(logits)[:, 1:], want_neg, rtol=1e-5)
    # pos at column 0
    want_pos = np.sum(np.asarray(qq) * np.asarray(kk), axis=1) / 0.07
    np.testing.assert_allclose(np.asarray(logits)[:, 0], want_pos, rtol=1e-5)
    # and the new queue holds the keys at rows 0..2
    np.testing.assert_allclose(
        np.asarray(new_q.memory["memory"])[:3], np.asarray(kk), rtol=1e-6
    )
    assert int(new_q.ptr) == 3


def test_all_k_advances_pointer_by_global_count():
    """Queue advances by |all_k| (world_size*B in the reference,
    mem_moco.py:99) — not by the local batch."""
    q = QueueState.create(jax.random.PRNGKey(2), K=64, n_dim=4)
    qq = jnp.ones((2, 4))
    kk = jnp.ones((2, 4))
    all_k = jnp.ones((16, 4))  # gathered over 8 replicas
    _, new_q = step_moco(q, qq, kk, all_k, T=0.1)
    assert int(new_q.ptr) == 16


def test_moco_st_dual_banks():
    q = QueueState.create(
        jax.random.PRNGKey(3), K=16, n_dim=4, names=("memory_s", "memory_t")
    )
    rs = np.random.RandomState(0)
    qq, kk, kt = (jnp.asarray(_norm_rows(rs.randn(3, 4)).astype(np.float32)) for _ in range(3))
    l_ss, l_st, new_q = step_moco_st(q, qq, kk, kt, None, None, T=0.07)
    assert l_ss.shape == (3, 17) and l_st.shape == (3, 17)
    np.testing.assert_allclose(np.asarray(new_q.memory["memory_s"])[:3], np.asarray(kk), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_q.memory["memory_t"])[:3], np.asarray(kt), rtol=1e-6)
    assert int(new_q.ptr) == 3


def test_contrast_ce_is_ce_with_zero_labels():
    logits = jnp.asarray(np.random.RandomState(0).randn(5, 9).astype(np.float32))
    want = -np.mean(
        np.asarray(jax.nn.log_softmax(logits, axis=1))[:, 0]
    )
    assert float(contrast_ce(logits)) == pytest.approx(float(want), rel=1e-6)


def test_queue_jit_in_step():
    """queue update must be jit-compatible and donate-friendly."""

    @jax.jit
    def one(q, keys):
        logits, q2 = step_moco(q, keys, keys, None, 0.2)
        return jnp.sum(logits), q2

    q = QueueState.create(jax.random.PRNGKey(0), K=32, n_dim=8)
    s, q2 = one(q, jnp.ones((4, 8)) / jnp.sqrt(8.0))
    assert np.isfinite(float(s))
    assert int(q2.ptr) == 4
