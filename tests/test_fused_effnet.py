"""Fused recompute-style EfficientNet forward (ops/fused_effnet*.py).

Oracles:
  * reference_forward (pure-jnp NCHW) vs the flax NHWC model — exact at f32
  * fused_forward (Pallas, interpret on CPU) vs reference_forward — f32
    near-exact for train (batch stats) and eval (running stats), covering
    stride-1/2, k3/k5, expand-1/6 blocks via the full b0 stack
  * updated_batch_stats tree matches flax's mutable batch_stats update
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.models import create_model
from moma_tpu.ops import fused_effnet as FE
from moma_tpu.ops import fused_effnet_pallas as FEP


@pytest.fixture(scope="module")
def setup():
    m = create_model("effiB0", num_classes=5)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)), train=False)
    # non-trivial running stats so the eval path is actually exercised
    rng = np.random.RandomState(7)
    v = jax.tree_util.tree_map(lambda a: a, v)

    def randomize(tree):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out[k] = randomize(val)
            elif k == "mean":
                out[k] = jnp.asarray(rng.randn(*val.shape) * 0.05, val.dtype)
            elif k == "var":
                out[k] = jnp.asarray(rng.rand(*val.shape) * 0.5 + 0.5,
                                     val.dtype)
            else:
                out[k] = val
        return out

    v = {"params": v["params"], "batch_stats": randomize(v["batch_stats"])}
    params, specs = FE.extract_params(v)
    x_nhwc = jnp.asarray(rng.randn(3, 64, 64, 3), jnp.float32)
    return m, v, params, specs, x_nhwc


def test_reference_matches_flax_eval(setup):
    m, v, params, specs, x = setup
    feats, logits = m.apply(v, x, train=False)
    pooled, lg, _ = FE.reference_forward(
        params, specs, jnp.transpose(x, (0, 3, 1, 2)), train=False,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(feats[-1]), np.asarray(pooled),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(lg), atol=1e-5)


def test_reference_matches_flax_train_and_stats(setup):
    m, v, params, specs, x = setup
    (feats, logits), mut = m.apply(v, x, train=True,
                                   mutable=["batch_stats"])
    pooled, lg, st = FE.reference_forward(
        params, specs, jnp.transpose(x, (0, 3, 1, 2)), train=True,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(feats[-1]), np.asarray(pooled),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(lg), atol=2e-4)
    nbs = FE.updated_batch_stats(v["batch_stats"], specs, st)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4),
        mut["batch_stats"], nbs)


@pytest.mark.parametrize("train", [False, True])
def test_pallas_matches_reference_f32(setup, train):
    _, v, params, specs, x = setup
    xc = jnp.transpose(x, (0, 3, 1, 2))
    pr, lr, str_ = FE.reference_forward(params, specs, xc, train=train,
                                        compute_dtype=jnp.float32)
    pp, lp, stp = FEP.fused_forward(params, specs, x, train=train,
                                    interpret=True,
                                    compute_dtype=jnp.float32)
    scale = float(jnp.abs(pr).max()) + 1e-6
    assert float(jnp.abs(pr - pp).max()) / scale < 1e-3
    lscale = float(jnp.abs(lr).max()) + 1e-6
    assert float(jnp.abs(lr - lp).max()) / lscale < 1e-3
    if train:
        assert len(str_) == len(stp) == 49
        for (mr, vr), (mp, vp) in zip(str_, stp):
            m_s = float(jnp.abs(mr).max()) + 1e-2
            v_s = float(jnp.abs(vr).max()) + 1e-2
            assert float(jnp.abs(mr - mp).max()) / m_s < 1e-3
            assert float(jnp.abs(vr - vp).max()) / v_s < 1e-3


def test_pallas_bf16_close(setup):
    """bf16 end-to-end: rounding drift amplified through 49 chained BNs is
    expected; bound it loosely and require the same order as reference-vs-
    flax bf16 drift."""
    m, v, params, specs, x = setup
    xc = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.bfloat16)
    pr, lr, _ = FE.reference_forward(params, specs, xc, train=True,
                                     compute_dtype=jnp.bfloat16)
    pp, lp, _ = FEP.fused_forward(params, specs, x.astype(jnp.bfloat16),
                                  train=True, interpret=True)
    scale = float(jnp.abs(pr.astype(jnp.float32)).max()) + 1e-6
    rel = float(jnp.abs(pr.astype(jnp.float32)
                        - pp.astype(jnp.float32)).max()) / scale
    assert rel < 0.5, rel
