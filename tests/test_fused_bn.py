"""Fused BatchNorm (ops/fused_bn.py) — parity vs flax nn.BatchNorm.

The fused op must be numerically indistinguishable from flax's BatchNorm
(which itself mirrors torch BN train semantics per models/common.py) in
forward, backward, and running-stats update, in both the lane-packed
Pallas path (interpret mode on CPU) and the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from moma_tpu.ops import fused_bn as FB


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    FB.set_fused_bn("auto")


def _flax_ref(x, scale, bias, eps, dtype, w):
    bn = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=eps,
                      dtype=dtype)
    bs0 = {"mean": jnp.zeros(x.shape[-1]), "var": jnp.ones(x.shape[-1])}

    def loss(x, s, b):
        v = {"params": {"scale": s, "bias": b}, "batch_stats": bs0}
        y, mut = bn.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) * w), (y, mut["batch_stats"])

    (l, (y, bs)), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                         has_aux=True)(x, scale, bias)
    return y, bs, g


def _fused(x, scale, bias, eps, out_dtype, w):
    def loss(x, s, b):
        y, mean, var = FB.fused_bn_train(x, s, b, eps, out_dtype)
        return jnp.sum(y.astype(jnp.float32) * w), (y, mean, var)

    (l, (y, mean, var)), g = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(x, scale, bias)
    return y, mean, var, g


@pytest.mark.parametrize("mode", ["on", "xla", "off"])
@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((8, 16, 16, 24), jnp.float32),
        ((8, 16, 16, 32), jnp.bfloat16),
        ((4, 8, 8, 144), jnp.float32),
        ((16, 13), jnp.float32),       # odd C -> in-op fallback
        ((4, 4, 2, 7), jnp.float32),   # R < 64 -> in-op fallback
    ],
)
def test_fused_bn_matches_flax(mode, shape, dtype):
    FB.set_fused_bn(mode)
    rng = np.random.RandomState(0)
    C = shape[-1]
    x = jnp.asarray(rng.randn(*shape), dtype)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)
    w = jnp.asarray(rng.randn(*shape), jnp.float32)
    eps = 1e-3
    flax_dtype = dtype if dtype == jnp.bfloat16 else None

    ref_y, ref_bs, ref_g = _flax_ref(x, scale, bias, eps, flax_dtype, w)
    y, mean, var, g = _fused(x, scale, bias, eps, ref_y.dtype, w)

    assert y.dtype == ref_y.dtype
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.float32(y), np.float32(ref_y),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(ref_bs["mean"], 0.01 * mean, atol=1e-6)
    np.testing.assert_allclose(ref_bs["var"], 0.99 + 0.01 * var, rtol=1e-5)
    scale_ref = np.abs(np.float32(ref_g[0])).max() + 1e-3
    np.testing.assert_allclose(np.float32(g[0]) / scale_ref,
                               np.float32(ref_g[0]) / scale_ref,
                               atol=tol)
    for i in (1, 2):
        s = np.abs(ref_g[i]).max() + 1e-3
        np.testing.assert_allclose(g[i] / s, ref_g[i] / s, atol=2e-4)


@pytest.mark.parametrize("C", [16, 24, 32, 96, 144, 240, 672, 1280])
def test_channel_sums_packing(C):
    rng = np.random.RandomState(C)
    x = jnp.asarray(rng.randn(4, 8, 8, C), jnp.float32)
    s, q = FB.channel_sums(x, interpret=True)
    # different accumulation order than numpy: rounding-level abs tolerance
    np.testing.assert_allclose(s, np.sum(np.float32(x), (0, 1, 2)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(q, np.sum(np.float32(x) ** 2, (0, 1, 2)),
                               rtol=1e-4, atol=1e-3)


def test_grad_channel_sums():
    rng = np.random.RandomState(1)
    C = 24
    x = jnp.asarray(rng.randn(4, 8, 8, C), jnp.float32)
    dy = jnp.asarray(rng.randn(4, 8, 8, C), jnp.float32)
    mean = jnp.asarray(rng.randn(C), jnp.float32)
    s, p = FB.grad_channel_sums(dy, x, mean, interpret=True)
    np.testing.assert_allclose(s, np.sum(np.float32(dy), (0, 1, 2)),
                               rtol=1e-4, atol=1e-3)
    ref_p = np.sum(np.float32(dy) * (np.float32(x) - np.float32(mean)),
                   (0, 1, 2))
    np.testing.assert_allclose(p, ref_p, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("mode", ["on", "xla", "off"])
@pytest.mark.parametrize("train", [True, False])
def test_module_drop_in(mode, train):
    """FusedBatchNorm(name='BatchNorm_0') has nn.BatchNorm's exact variable
    tree and output in both modes."""
    FB.set_fused_bn(mode)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 4, 4, 24), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5)(x)

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FB.FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="BatchNorm_0",
            )(x)

    vref = Ref().init(jax.random.PRNGKey(0), x)
    vfus = Fused().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vref) == jax.tree_util.tree_structure(vfus)
    # inject identical (non-trivial) state
    bs = {"BatchNorm_0": {"mean": jnp.asarray(rng.randn(24), jnp.float32),
                          "var": jnp.asarray(rng.rand(24) + 0.5, jnp.float32)}}
    pr = {"BatchNorm_0": {"scale": jnp.asarray(rng.rand(24) + 0.5, jnp.float32),
                          "bias": jnp.asarray(rng.randn(24), jnp.float32)}}
    yref, mref = Ref().apply({"params": pr, "batch_stats": bs}, x,
                             mutable=["batch_stats"])
    yfus, mfus = Fused().apply({"params": pr, "batch_stats": bs}, x,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.float32(yref), np.float32(yfus), atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        mref["batch_stats"], mfus["batch_stats"],
    )


def test_sync_bn_axis_name(mesh8):
    """axis_name path: per-shard FusedBatchNorm under shard_map == global BN."""
    FB.set_fused_bn("off")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 4, 4, 8), jnp.float32)

    bn = FB.FusedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, axis_name="data")
    # init outside any mapped axis: use the (structurally identical)
    # axis-free module
    v = FB.FusedBatchNorm(
        use_running_average=False, momentum=0.9, epsilon=1e-5
    ).init(jax.random.PRNGKey(0), x[:2])

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(x):
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        return y

    y_sharded = shard_map(
        local, mesh=mesh8,
        in_specs=P("data"), out_specs=P("data"),
    )(x)

    bn_g = FB.FusedBatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5)
    y_global, _ = bn_g.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.float32(y_sharded), np.float32(y_global),
                               atol=1e-4)
