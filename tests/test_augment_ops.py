"""Device augmentation primitive checks: RRC matmul-resize vs gather
reference, crop/flip semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.data.augment import (
    _bilinear_gather,
    _random_crop_pad,
    random_hflip,
    random_resized_crop,
)


def test_rrc_matmul_equals_gather_reference():
    """The MXU resize path must agree with direct bilinear gathering."""
    rs = np.random.RandomState(0)
    B, H, W, S = 4, 24, 24, 16
    imgs = jnp.asarray(rs.randint(0, 256, (B, H, W, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(3)
    out = random_resized_crop(imgs, rng, S, scale=(0.3, 1.0))
    assert out.shape == (B, S, S, 3)
    # recompute the same crop boxes and sample via the gather reference
    k_area, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    area = H * W
    target_area = area * jax.random.uniform(k_area, (B,), minval=0.3, maxval=1.0)
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, (B,), minval=jnp.log(3 / 4), maxval=jnp.log(4 / 3)
        )
    )
    w = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)), 1, W)
    h = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)), 1, H)
    i = jnp.floor(jax.random.uniform(k_i, (B,)) * (H - h + 1))
    j = jnp.floor(jax.random.uniform(k_j, (B,)) * (W - w + 1))
    ys = jnp.linspace(0.0, 1.0, S, endpoint=False) + 0.5 / S
    src_y = jnp.clip(i[:, None] + ys[None, :] * h[:, None] - 0.5, 0, H - 1)
    src_x = jnp.clip(j[:, None] + ys[None, :] * w[:, None] - 0.5, 0, W - 1)
    want = _bilinear_gather(imgs, src_y, src_x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-3)


def test_random_crop_pad_contains_original_content():
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.randint(0, 256, (8, 16, 16, 3)).astype(np.float32))
    out = _random_crop_pad(imgs, jax.random.PRNGKey(0), padding=2)
    assert out.shape == imgs.shape
    # every output pixel is either 0 (pad) or present in the source image
    assert float(jnp.max(out)) <= float(jnp.max(imgs))


def test_hflip_is_exact_mirror_when_forced():
    rs = np.random.RandomState(2)
    imgs = jnp.asarray(rs.randint(0, 256, (4, 8, 8, 3)).astype(np.float32))
    out = random_hflip(imgs, jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs[:, :, ::-1, :]))
