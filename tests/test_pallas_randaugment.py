"""Pallas RA layer (interpret mode on CPU) vs the XLA staged layer —
identical rng => near-identical output (the kernel fuses the same math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.data import randaugment as RA
from moma_tpu.ops.pallas_randaugment import ra_layer_pallas

FILL = (124.0, 116.0, 104.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_layer_matches_xla_layer(seed):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(
        rs.randint(0, 256, (8, 3, 32, 32)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(seed)
    want = RA.randaugment_layer(x, rng, 10.0, 0.5, FILL)
    got = ra_layer_pallas(x, rng, 10.0, 0.5, FILL, interpret=True)
    # the kernel rounds at the end (inter-layer PIL quantization);
    # round the XLA reference the same way before comparing
    np.testing.assert_allclose(
        np.asarray(jnp.round(jnp.clip(want, 0, 255))), np.asarray(got),
        atol=1.0,
    )


def test_pallas_layer_prob_gate_identity():
    """With prob=0 every image must come through untouched (modulo the
    final rounding)."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randint(0, 256, (4, 3, 16, 16)).astype(np.float32))
    got = ra_layer_pallas(x, jax.random.PRNGKey(0), 10.0, 0.5, FILL,
                          prob=0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=0)


@pytest.mark.parametrize("prob", [0.0, 0.5, 1.0])
def test_pallas_layer_fused_hflip(prob):
    """The in-kernel MXU flip must equal flipping the input first —
    exactly (each flipped pixel is one 1.0*value product) — across
    skipped, mixed, and all-applied gates."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randint(0, 256, (6, 3, 16, 32)).astype(np.float32))
    hflip = jnp.asarray([True, False, True, True, False, False])
    rng = jax.random.PRNGKey(9)
    want = ra_layer_pallas(
        jnp.where(hflip[:, None, None, None], x[..., ::-1], x),
        rng, 10.0, 0.5, FILL, prob=prob, interpret=True)
    got = ra_layer_pallas(x, rng, 10.0, 0.5, FILL, prob=prob,
                          interpret=True, hflip=hflip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_rand_augment_hflip_rng_xla_path():
    """rand_augment(hflip_rng=k) on the XLA path must equal
    random_hflip(x, k) |> rand_augment — bit-identical draws."""
    from moma_tpu.data.augment import random_hflip

    rs = np.random.RandomState(11)
    x_nhwc = jnp.asarray(rs.randint(0, 256, (8, 20, 20, 3)).astype(np.float32))
    k_flip = jax.random.PRNGKey(3)
    k_ra = jax.random.PRNGKey(4)
    want = RA.rand_augment(random_hflip(x_nhwc, k_flip), k_ra,
                           use_pallas=False)
    got = RA.rand_augment(x_nhwc, k_ra, use_pallas=False,
                          hflip_rng=k_flip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_pallas_layer_identity_op_exact():
    """The CMC table's Identity op (id 15, a dispatch no-op) through the
    KERNEL path: with the prob gate forced on, every stage's scalar
    degenerates and the integer image passes through exactly."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randint(0, 256, (4, 3, 16, 16)).astype(np.float32))
    got = ra_layer_pallas(
        x, jax.random.PRNGKey(0), 10.0, 0.5, FILL, prob=1.0,
        interpret=True,
        op=jnp.full((4,), RA.IDENTITY_OP, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=0)
