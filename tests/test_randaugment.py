"""Device RandAugment vs PIL golden values — each op family checked
against the exact PIL call the reference makes (dataset/RandAugment.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.data import randaugment as RA

PIL = pytest.importorskip("PIL")
from PIL import Image, ImageEnhance, ImageOps  # noqa: E402


def _img(seed=0, size=24):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, (size, size, 3), dtype=np.uint8)


def _apply_lut(lut, x_int):
    B = 1
    bidx = np.zeros_like(x_int)
    out = np.asarray(lut)[0][
        np.broadcast_to(np.arange(3)[None, None, :], x_int.shape), x_int
    ]
    return out


def test_invert_lut():
    x = _img(0)
    want = np.asarray(ImageOps.invert(Image.fromarray(x)))
    lut = RA._invert_lut(1)
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mag", [2.0, 5.0, 10.0])
def test_posterize_lut(mag):
    x = _img(1)
    bits = int(mag / 10.0 * 4)  # PosterizeTpu mapping
    want = np.asarray(
        ImageOps.posterize(Image.fromarray(x), bits) if bits < 8 else x
    )
    lut = RA._posterize_lut(1, jnp.asarray([mag]))
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mag", [3.0, 7.0, 10.0])
def test_solarize_lut(mag):
    x = _img(2)
    thresh = int(mag / 10.0 * 256)
    want = np.asarray(ImageOps.solarize(Image.fromarray(x), thresh))
    lut = RA._solarize_lut(1, jnp.asarray([mag]))
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mag", [3.0, 10.0])
def test_solarize_add_lut(mag):
    x = _img(3)
    add = int(mag / 10.0 * 110)
    lut_ref = [min(255, i + add) if i < 128 else i for i in range(256)]
    want = np.asarray(Image.fromarray(x).point(lut_ref * 3))
    lut = RA._solarize_add_lut(1, jnp.asarray([mag]))
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


def _hist_nhwc(x):
    """Test helper: histograms on an HWC uint8 image (internals are NCHW)."""
    return RA._histograms(
        jnp.transpose(jnp.asarray(x[None]).astype(jnp.int32), (0, 3, 1, 2))
    )


def test_autocontrast_lut():
    x = (_img(4).astype(np.int32) // 2 + 40).astype(np.uint8)  # compressed range
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(x)))
    lut = RA._autocontrast_lut(_hist_nhwc(x))
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_allclose(got, want, atol=1)  # PIL rounds via int LUT


def test_equalize_lut():
    x = _img(5)
    want = np.asarray(ImageOps.equalize(Image.fromarray(x)))
    lut = RA._equalize_lut(_hist_nhwc(x))
    got = _apply_lut(lut, x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


def test_apply_lut_matmul_matches_direct():
    """The one-hot-contraction LUT application must equal direct indexing
    EXACTLY for integer-valued LUTs (the documented invariant: every LUT
    builder emits integers 0..255, which lets _apply_lut run in bf16)."""
    rs = np.random.RandomState(11)
    x = rs.randint(0, 256, (4, 3, 8, 8)).astype(np.int32)  # NCHW
    lut = rs.randint(0, 256, (4, 3, 256)).astype(np.float32)
    got = np.asarray(RA._apply_lut(jnp.asarray(lut), jnp.asarray(x)))
    want = np.empty_like(got)
    for b in range(4):
        for c in range(3):
            want[b, c] = lut[b, c][x[b, c]]
    np.testing.assert_array_equal(got, want)


def test_all_lut_builders_emit_integers():
    """bf16 exactness of _apply_lut rests on LUT values being integers in
    [0,255] — pin that for every builder, including data-dependent ones."""
    rs = np.random.RandomState(12)
    x = jnp.asarray(rs.randint(0, 256, (3, 3, 16, 16)).astype(np.int32))
    hist = RA._histograms(x)
    mag = jnp.asarray([0.0, 5.7, 10.0])
    luts = {
        "identity": RA._identity_lut(3),
        "invert": RA._invert_lut(3),
        "posterize": RA._posterize_lut(3, mag),
        "solarize": RA._solarize_lut(3, mag),
        "solarize_add": RA._solarize_add_lut(3, mag),
        "autocontrast": RA._autocontrast_lut(hist),
        "equalize": RA._equalize_lut(hist),
    }
    for name, lut in luts.items():
        a = np.asarray(lut)
        assert np.array_equal(a, np.round(a)), f"{name} LUT not integral"
        assert a.min() >= 0 and a.max() <= 255, f"{name} LUT out of range"


@pytest.mark.parametrize("factor", [0.1, 0.64, 1.9])
def test_brightness_matrix(factor):
    x = _img(6).astype(np.float32)
    want = np.asarray(
        ImageEnhance.Brightness(Image.fromarray(x.astype(np.uint8))).enhance(factor)
    )
    got = np.clip(np.round(x * factor), 0, 255)
    np.testing.assert_allclose(got, want, atol=1)


def test_color_matrix_matches_pil():
    x = _img(7)
    factor = 0.46
    want = np.asarray(
        ImageEnhance.Color(Image.fromarray(x)).enhance(factor)
    ).astype(np.float32)
    # replicate the stage-2 math for the Color op
    luma = np.asarray(RA.LUMA)
    # PIL degenerate = round(L) per pixel then blend
    L = np.floor(x.astype(np.float32) @ luma + 0.5)
    got = L[..., None] + factor * (x.astype(np.float32) - L[..., None])
    got = np.clip(np.round(got), 0, 255)
    np.testing.assert_allclose(got, want, atol=1)


def _smooth_img(size=32):
    """Smooth test image: noise parity is meaningless for the 3-pass shear
    rotation (separable filtering responds differently to white noise than
    one-shot bilinear; on natural/smooth content they agree)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r = np.stack(
        [
            127 + 80 * np.sin(xx / 6.0) * np.cos(yy / 9.0),
            127 + 100 * np.cos((xx + yy) / 11.0),
            127 + 60 * np.sin(yy / 5.0),
        ],
        axis=-1,
    )
    return np.clip(r, 0, 255).astype(np.uint8)


def test_rotate_affine_close_to_pil():
    x = _smooth_img(32)
    deg = 17.0
    want = np.asarray(
        Image.fromarray(x).rotate(
            deg, resample=Image.BILINEAR, fillcolor=(128, 128, 128)
        )
    ).astype(np.float32)
    op = jnp.asarray([3])
    m = RA._affine_matrix(op, jnp.asarray([deg / 30.0 * 10.0]),
                          jnp.asarray([True]), 32)
    got = np.asarray(
        RA._affine_sample(
            jnp.transpose(jnp.asarray(x[None]).astype(jnp.float32), (0, 3, 1, 2)),
            m, jnp.asarray([128.0, 128.0, 128.0]),
        )
    )[0].transpose(1, 2, 0)
    # interpolation/rounding differ at edges; interior must agree closely
    diff = np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert np.percentile(diff, 95) <= 3.0, np.percentile(diff, 95)


def test_translate_affine_exact():
    x = _img(9, size=16)
    pct = 0.25
    want = np.asarray(
        Image.fromarray(x).transform(
            (16, 16), Image.AFFINE, (1, 0, pct * 16, 0, 1, 0),
            resample=Image.BILINEAR, fillcolor=(128, 128, 128),
        )
    ).astype(np.float32)
    op = jnp.asarray([13])
    m = RA._affine_matrix(op, jnp.asarray([pct / 0.45 * 10.0]),
                          jnp.asarray([True]), 16)
    got = np.asarray(
        RA._affine_sample(
            jnp.transpose(jnp.asarray(x[None]).astype(jnp.float32), (0, 3, 1, 2)),
            m, jnp.asarray([128.0, 128.0, 128.0]),
        )
    )[0].transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1)


def test_full_pipeline_runs_and_stays_in_range():
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    out = RA.rand_augment(jnp.asarray(imgs), jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == imgs.shape
    assert out.min() >= 0 and out.max() <= 255
    # with prob 0.5/op some images should differ and (likely) some not
    assert np.abs(out - imgs).sum() > 0


def test_pipeline_deterministic():
    imgs = jnp.asarray(_img(10)[None])
    a = RA.rand_augment(imgs, jax.random.PRNGKey(7))
    b = RA.rand_augment(imgs, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_parse_ra_config_grammar():
    """The reference's rand_augment_transform grammar (RandAugment.py:
    405-448), including its own docstring examples."""
    # 'rand-m9-n3-mstd0.5' -> magnitude 9, layers 3, mstd 0.5
    assert RA.parse_ra_config("rand-m9-n3-mstd0.5") == (3, 9.0, 0.5, None)
    # 'rand-mstd1-w0' -> mstd 1.0, weight set 0, defaults m10 n2
    n, m, mstd, w = RA.parse_ra_config("rand-mstd1-w0")
    assert (n, m, mstd) == (2, 10.0, 1.0)
    assert w == RA.select_rand_weights(0)
    assert abs(sum(w) - 1.0) < 1e-6
    # the training default
    assert RA.parse_ra_config("rand-n2-m10-mstd0.5") == (2, 10.0, 0.5, None)
    # keyless sections are skipped (reference `continue`s them); an
    # omitted mstd means NO magnitude noise (AutoAugmentOp default 0)
    assert RA.parse_ra_config("rand-xyz-m5") == (2, 5.0, 0.0, None)
    with pytest.raises(ValueError, match="must start with 'rand'"):
        RA.parse_ra_config("autoaug-m9")
    with pytest.raises(ValueError, match="unknown RandAugment config"):
        RA.parse_ra_config("rand-q3")
    with pytest.raises(ValueError, match="weight set 0"):
        RA.parse_ra_config("rand-w1")


def test_weighted_op_choice_distribution():
    """'w0' weights: the reference draws ALL layer ops per image in ONE
    np.random.choice(..., replace=False, p=w) (RandAugment.py:396-398) —
    so zero-weight ops (Invert=2, PosterizeTpu=4) never appear, an image
    never repeats an op across layers, and Rotate (weight 0.3) dominates."""
    w = RA.select_rand_weights(0)
    ops = np.asarray(
        RA.draw_ops_weighted(jax.random.PRNGKey(0), 4096, 2, w))
    assert ops.shape == (4096, 2)
    counts = np.bincount(ops.ravel(), minlength=RA.N_OPS)
    assert counts[2] == 0 and counts[4] == 0
    assert counts[3] == counts.max()
    # WITHOUT replacement: no image's two layers share an op
    assert (ops[:, 0] != ops[:, 1]).all()
    # more layers than nonzero-weight ops is impossible to sample
    with pytest.raises(ValueError, match="without replacement"):
        RA.draw_ops_weighted(jax.random.PRNGKey(0), 8, 14, w)
    # and the weighted pipeline runs end-to-end on both code paths
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, 24, 24, 3), np.uint8))
    out = RA.rand_augment(imgs, jax.random.PRNGKey(1), choice_weights=w)
    assert np.isfinite(np.asarray(out)).all()


def test_ra_config_reaches_histo_augment():
    """--ra_config flows from the config into the augment stage; a bad
    string fails at construction, not at trace time."""
    from moma_tpu.core.config import parse_teacher_args
    from moma_tpu.data.histo_augment import make_histo_augment

    cfg = parse_teacher_args(
        "--model resnet8 --dataset prostate_hv --image_size 32 "
        "--ra_config rand-n1-m5-mstd0.1".split())
    assert cfg.data.ra_config == "rand-n1-m5-mstd0.1"
    fn = make_histo_augment(cfg)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    assert fn(imgs, jax.random.PRNGKey(0)).shape == (2, 32, 32, 3)

    cfg.data.ra_config = "rand-bogus5"
    with pytest.raises(ValueError, match="unknown RandAugment"):
        make_histo_augment(cfg)


def test_cmc_op_table_preset():
    """use_cmc: the color-op-free table (rand_augment_ops_cmc,
    RandAugment.py:383-389).  The table maps to geometry/sharpness ops
    plus the explicit Identity (a dispatch no-op id), the drawn ops land
    only in the table, and Identity passes integers through exactly."""
    # table contents: no LUT/color/enhance ops except AutoContrast+Sharpness
    assert RA.CMC_OP_IDS == (0, RA.IDENTITY_OP, 3, 10, 11, 12, 13, 14)
    for banned in ("Equalize", "Invert", "Solarize", "SolarizeAdd",
                   "PosterizeTpu", "Color", "Contrast", "Brightness"):
        assert banned not in RA.CMC_OP_NAMES

    # Identity id is an exact pass-through of the integer image even
    # when the prob gate fires (prob=1.0 forces it)
    x = jnp.asarray(_img(3, 16)[None]).astype(jnp.float32)
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    y = RA.randaugment_layer(
        x_nchw, jax.random.PRNGKey(0), 10.0, 0.0, (124.0, 116.0, 104.0),
        prob=1.0, op=jnp.full((1,), RA.IDENTITY_OP, jnp.int32))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x_nchw))

    # the use_cmc draw: reproduce rand_augment's internal stream and
    # check every drawn id is in the table
    rng = jax.random.PRNGKey(7)
    idx = jax.random.randint(jax.random.fold_in(rng, 2), (64, 2),
                             0, len(RA.CMC_OP_IDS))
    ops = np.asarray(jnp.asarray(RA.CMC_OP_IDS, jnp.int32)[idx])
    assert set(ops.ravel()).issubset(set(RA.CMC_OP_IDS))

    # end-to-end on the XLA path; finite + in range
    imgs = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (4, 24, 24, 3), np.uint8))
    out = RA.rand_augment(imgs, rng, use_cmc=True, use_pallas=False)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 255.0

    # w-weights x cmc is broken upstream (15-prob vector vs 8 ops);
    # we reject the combination loudly
    with pytest.raises(ValueError, match="use_cmc"):
        RA.rand_augment(imgs, rng, use_cmc=True,
                        choice_weights=RA.select_rand_weights(0))


def test_use_cmc_reaches_histo_augment():
    """--use_cmc flows from the CLI into the augment stage."""
    from moma_tpu.core.config import parse_teacher_args
    from moma_tpu.data.histo_augment import make_histo_augment

    cfg = parse_teacher_args(
        "--model resnet8 --dataset prostate_hv --image_size 32 "
        "--use_cmc".split())
    assert cfg.data.use_cmc is True
    fn = make_histo_augment(cfg)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    assert fn(imgs, jax.random.PRNGKey(0)).shape == (2, 32, 32, 3)
