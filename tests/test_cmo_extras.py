"""CMO optional extras: RFF heads (criterion_moco_att.py:35-112) and the
3-way CMO_EmaTec head set (:344-419)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.moma.cmo import CMOEmaTecHeads, RFFHead


def test_rff_fixed_matches_formula():
    mod = RFFHead(out_dim=32, fixed=True)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    W = np.asarray(variables["constants"]["B_w"])
    b = np.asarray(variables["constants"]["B_b"])
    want = (2.0 / 16) ** 0.5 * np.cos(np.asarray(x) @ W + b)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
    # fixed: same draw across calls
    out2 = mod.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_rff_random_redraws_per_call():
    mod = RFFHead(out_dim=32, fixed=False)
    x = jnp.ones((4, 16))
    variables = mod.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    a = mod.apply(variables, x, rng=jax.random.PRNGKey(2))
    b = mod.apply(variables, x, rng=jax.random.PRNGKey(3))
    assert np.abs(np.asarray(a) - np.asarray(b)).sum() > 0
    # RFF_ST semantics: the same rng shared by two inputs = shared draw
    c = mod.apply(variables, x * 2, rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(c)).all()


def test_ematec_three_heads():
    heads = CMOEmaTecHeads(head="mlp", feat_dim=32, s_dim=64, t_dim=48)
    params, bs = heads.init(jax.random.PRNGKey(0))
    assert set(params) == {"embed_s", "embed_ema", "embed_t"}
    f_s = jnp.ones((4, 64))
    f_t = jnp.ones((4, 48))
    e_s = heads.embed("embed_s", params, f_s)
    e_ema = heads.embed("embed_ema", params, f_s)
    e_t = heads.embed("embed_t", params, f_t)
    for e in (e_s, e_ema, e_t):
        assert e.shape == (4, 32)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0,
                                   rtol=1e-5)
    # embed_s and embed_ema are distinct parameterizations
    assert np.abs(np.asarray(e_s) - np.asarray(e_ema)).sum() > 0
