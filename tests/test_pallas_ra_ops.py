"""Forced per-op coverage of the v2 in-kernel RandAugment LUT stage.

ra_layer_pallas samples (op, mag, sign, apply) internally, so random
seeds may never hit the rare in-kernel paths (equalize histogram loop,
autocontrast min/max, posterize/solarize arithmetic).  These tests
inject the draws via ra_layer_from_draws and compare each op — at
magnitude extremes and on degenerate images — against the staged XLA
reference path built from the golden-tested data/randaugment helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.data import randaugment as RA
from moma_tpu.ops.pallas_randaugment import ra_layer_from_draws

FILL = (124.0, 116.0, 104.0)


def xla_forced(x, op, mag, sign):
    """The staged XLA layer with injected draws (mirrors
    randaugment_layer minus sampling/prob gate), output rounded."""
    B, C, H, W = x.shape
    fill_v = jnp.asarray(FILL, jnp.float32)
    x_int = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    hist = RA._histograms(x_int)
    lut = RA._identity_lut(B)
    for opid, tab in ((0, RA._autocontrast_lut(hist)),
                      (1, RA._equalize_lut(hist)),
                      (2, RA._invert_lut(B)),
                      (4, RA._posterize_lut(B, mag)),
                      (5, RA._solarize_lut(B, mag)),
                      (6, RA._solarize_add_lut(B, mag))):
        lut = jnp.where((op == opid)[:, None, None], tab, lut)
    y = RA._apply_lut(lut, x_int)
    f = RA._enhance_factor(mag)
    a = jnp.where((op == 7) | (op == 8) | (op == 9), f, 1.0)
    b = jnp.where(op == 7, 1.0 - f, 0.0)
    luma = jnp.floor(jnp.einsum("bchw,c->bhw", y, RA.LUMA) + 0.5)
    mean_l = jnp.floor(jnp.mean(luma, axis=(1, 2)) + 0.5)
    c_off = jnp.where(op == 8, (1.0 - f) * mean_l, 0.0)
    y = (a[:, None, None, None] * y + b[:, None, None, None]
         * luma[:, None] + c_off[:, None, None, None])
    sharp_f = jnp.where(op == 10, f, 1.0)
    sm = RA._smooth(y)
    y = sm + sharp_f[:, None, None, None] * (y - sm)
    m = RA._affine_matrix(op, mag, sign, H)
    y = RA._affine_sample(y, m, fill_v)
    return jnp.round(jnp.clip(y, 0.0, 255.0))


def _images():
    """4 images incl. the degenerate cases: constant (equalize step==0 /
    autocontrast hi==lo -> identity), two-value, full-range, random."""
    rs = np.random.RandomState(0)
    B, H, W = 4, 32, 32
    x = rs.randint(0, 256, (B, 3, H, W)).astype(np.float32)
    x[0] = 77.0
    x[1] = np.where(rs.rand(3, H, W) < 0.5, 3.0, 250.0)
    x[2, :, 0, 0] = 0.0
    x[2, :, -1, -1] = 255.0
    return jnp.asarray(x)


@pytest.mark.parametrize("opid", list(range(15)))
@pytest.mark.parametrize("mag", [0.0, 4.9, 10.0])
def test_forced_op_matches_xla(opid, mag):
    x = _images()
    _check_forced(x, opid, mag)


@pytest.mark.parametrize("opid", [3, 11, 12, 13, 14])
def test_forced_affine_nonsquare(opid):
    """Geometric ops on a non-square image: pass 2 of the rotate shear
    ladder runs along columns, so its center is cx, not cy — a latent
    bug when H != W (every shipped pipeline is square)."""
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randint(0, 256, (4, 3, 24, 40)).astype(np.float32))
    _check_forced(x, opid, 10.0)


def _check_forced(x, opid, mag):
    B = x.shape[0]
    op = jnp.full((B,), opid, jnp.int32)
    magv = jnp.full((B,), mag, jnp.float32)
    sign = jnp.asarray([True, False, True, False])
    apply = jnp.ones((B,), bool)
    want = np.asarray(xla_forced(x, op, magv, sign))
    got = np.asarray(
        ra_layer_from_draws(x, op, magv, sign, apply, FILL, interpret=True)
    )
    # LUT ops are exact (identical integer-valued float formulas);
    # enhance/sharp/warp tolerate 1 quantum from float-order differences
    atol = 0.0 if opid in (0, 1, 2, 4, 5, 6) else 1.0
    np.testing.assert_allclose(got, want, atol=atol)
