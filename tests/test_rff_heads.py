"""RFFHead (moma/cmo.py) — the reference's RFF / RFF_ST / RFF_fixed
optional extras (criterion_moco_att.py:35-112, never reachable from its
CLI).

Exact oracle parity is impossible for two of the three reference
classes:

  * reference `RFF.forward` reads `self.in_dim`, which `RFF.__init__`
    never sets -> AttributeError on first call (latent defect);
  * `RFF_ST` omits the sqrt(2/in_dim) scale entirely (returns raw cos).

So these tests pin the documented semantics of our single RFFHead
instead: the closed-form map sqrt(2/in_dim)*cos(xW+b), draw lifetime
(fixed = module constant, non-fixed = per-call rng, shared across
student/teacher like RFF_ST's single draw), and the Gaussian-kernel
approximation property that makes random Fourier features meaningful at
all (Rahimi & Recht: E[z(x)z(y)] -> exp(-||x-y||^2/2) for W~N(0,1)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.moma.cmo import RFFHead


def _init_and_run(fixed, rng_call=None, in_dim=24, out_dim=128, seed=0):
    head = RFFHead(out_dim=out_dim, fixed=fixed)
    x = jax.random.normal(jax.random.key(seed + 1), (4, in_dim))
    variables = head.init(jax.random.key(seed), x, rng=rng_call)
    y = head.apply(variables, x, rng=rng_call)
    return head, variables, x, y


def test_fixed_closed_form_and_scale():
    _, variables, x, y = _init_and_run(fixed=True)
    W = variables["constants"]["B_w"]
    b = variables["constants"]["B_b"]
    in_dim = x.shape[-1]
    expect = np.sqrt(2.0 / in_dim) * np.cos(np.asarray(x) @ np.asarray(W)
                                            + np.asarray(b))
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)
    assert y.shape == (4, 128)
    # the map is bounded by its scale: |out| <= sqrt(2/in_dim)
    assert float(jnp.max(jnp.abs(y))) <= np.sqrt(2.0 / in_dim) + 1e-6


def test_fixed_draw_persists_across_calls():
    head, variables, x, y1 = _init_and_run(fixed=True)
    y2 = head.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_nonfixed_shared_draw_matches_rff_st_semantics():
    # RFF_ST draws ONE (W, b) and maps both student and teacher features
    # through it; with RFFHead the caller passes the same per-call rng.
    head = RFFHead(out_dim=64, fixed=False)
    xs = jax.random.normal(jax.random.key(1), (4, 16))
    xt = jax.random.normal(jax.random.key(2), (4, 16))
    variables = head.init(jax.random.key(0), xs, rng=jax.random.key(3))
    rng = jax.random.key(7)
    ys_a = head.apply(variables, xs, rng=rng)
    ys_b = head.apply(variables, xs, rng=rng)
    yt = head.apply(variables, xt, rng=rng)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    # same draw, different input -> correlated through (W, b): verify by
    # reconstructing the draw from equal inputs, then check a fresh rng
    # actually redraws.
    y_new = head.apply(variables, xs, rng=jax.random.key(8))
    assert not np.allclose(np.asarray(ys_a), np.asarray(y_new))
    assert yt.shape == (4, 64)


def test_gaussian_kernel_approximation():
    # sqrt(2/D)*cos(xW+b) with W~N(0,1), b~U(0,2pi) approximates the
    # RBF kernel: (2/in_dim normalization aside) out(x)@out(y) * in_dim/2
    # / out_dim -> exp(-||x-y||^2 / 2).
    in_dim, out_dim = 8, 8192
    head = RFFHead(out_dim=out_dim, fixed=True)
    x = jnp.zeros((1, in_dim))
    d = 0.7
    y = x.at[0, 0].add(d)
    variables = head.init(jax.random.key(5), x)
    zx = head.apply(variables, x)
    zy = head.apply(variables, y)
    # undo the head's sqrt(2/in_dim) scale, apply the estimator's 1/D
    k_hat = float(jnp.vdot(zx, zy)) * (in_dim / 2.0) * (2.0 / out_dim)
    k_true = float(np.exp(-(d ** 2) / 2.0))
    assert abs(k_hat - k_true) < 0.05, (k_hat, k_true)


def test_flattens_feature_maps():
    head = RFFHead(out_dim=32, fixed=True)
    x = jax.random.normal(jax.random.key(0), (2, 4, 3, 3))  # conv-style
    variables = head.init(jax.random.key(1), x)
    y = head.apply(variables, x)
    assert y.shape == (2, 32)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
