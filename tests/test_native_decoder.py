"""Native libjpeg decode + PIL-parity resize (data/native/decoder.cpp).

Parity targets: PIL `Image.open(...).convert("RGB")` (the reference's
pil_loader, dataset/dataset.py:12-16) and `Image.resize(BILINEAR)` (the
histo transform stacks, dataset/histo_dataset.py:207-239).
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from moma_tpu.data import native


def _jpeg_bytes(arr, quality=92):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def lib():
    lib = native.get_decoder_lib()
    if lib is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    return lib


def _rand_img(rs, h, w):
    # smooth-ish content so JPEG roundtrips tightly
    y, x = np.mgrid[0:h, 0:w]
    base = np.stack(
        [128 + 90 * np.sin(x / 17.0), 128 + 90 * np.cos(y / 23.0),
         128 + 60 * np.sin((x + y) / 31.0)], axis=-1)
    noise = rs.randint(-8, 8, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def test_full_size_decode_matches_pil(lib):
    rs = np.random.RandomState(0)
    img = _rand_img(rs, 96, 96)
    blob = _jpeg_bytes(img)
    ours = native.decode_mem(blob, 96)
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    # same libjpeg under both: full-size decode should be bit-exact
    assert ours.shape == (96, 96, 3)
    assert np.array_equal(ours, pil)


@pytest.mark.parametrize("in_hw,out_size", [
    ((512, 512), 448),   # the 448 preset's downscale
    ((512, 512), 128),   # 4x downscale (filter support matters)
    ((300, 200), 224),   # non-square, mixed up/down
    ((100, 100), 224),   # upscale
])
def test_resize_matches_pil_bilinear(lib, in_hw, out_size):
    rs = np.random.RandomState(1)
    img = _rand_img(rs, *in_hw)
    blob = _jpeg_bytes(img, quality=100)
    ours = native.decode_mem(blob, out_size).astype(np.int16)
    decoded = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    pil = np.asarray(
        Image.fromarray(decoded).resize((out_size, out_size), Image.BILINEAR)
    ).astype(np.int16)
    diff = np.abs(ours - pil)
    # Pillow computes in 8.8 fixed point, we use double: ±2 LSB tolerance
    assert diff.max() <= 2, f"max diff {diff.max()}"
    assert (diff > 1).mean() < 0.01


def test_grayscale_jpeg_converts_rgb(lib):
    rs = np.random.RandomState(2)
    g = _rand_img(rs, 64, 64)[..., 0]
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="JPEG", quality=95)
    ours = native.decode_mem(buf.getvalue(), 64)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(ours, pil)


def test_decode_files_batch_and_failures(lib, tmp_path):
    rs = np.random.RandomState(3)
    paths, refs = [], []
    for i in range(6):
        img = _rand_img(rs, 80 + 8 * i, 96)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        refs.append(np.asarray(
            Image.open(p).convert("RGB").resize((64, 64), Image.BILINEAR)))
    # one PNG (native decoder must flag it, not crash) + one missing file
    png = str(tmp_path / "img.png")
    Image.fromarray(_rand_img(rs, 64, 64)).save(png)
    paths.append(png)
    paths.append(str(tmp_path / "missing.jpg"))

    out, failed = native.decode_files(paths, 64, threads=4)
    assert out.shape == (8, 64, 64, 3)
    assert not failed[:6].any()
    assert failed[6] and failed[7]
    assert (out[6] == 0).all() and (out[7] == 0).all()
    for i in range(6):
        assert np.abs(out[i].astype(int) - refs[i].astype(int)).max() <= 2

    # out= path (pack-builder in-place decode, incl. memmap destinations):
    # identical rows, no allocation
    dest = np.memmap(str(tmp_path / "dest.bin"), dtype=np.uint8, mode="w+",
                     shape=(8, 64, 64, 3))
    ret, failed2 = native.decode_files(paths, 64, threads=2, out=dest)
    assert ret is dest
    np.testing.assert_array_equal(np.asarray(dest), out)
    np.testing.assert_array_equal(failed2, failed)


def test_fast_mode_dct_scaling_close(lib):
    rs = np.random.RandomState(4)
    img = _rand_img(rs, 1024, 1024)
    blob = _jpeg_bytes(img, quality=95)
    exact = native.decode_mem(blob, 128, fast=False).astype(np.int16)
    fast = native.decode_mem(blob, 128, fast=True).astype(np.int16)
    # DCT-scaled decode deviates slightly but must stay visually identical
    assert np.abs(exact - fast).mean() < 3.0


def test_packed_cache_uses_native(tmp_path, monkeypatch):
    from moma_tpu.data.histo import PackedCache

    rs = np.random.RandomState(5)
    pairs = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.jpg")
        Image.fromarray(_rand_img(rs, 72, 72)).save(p, quality=95)
        pairs.append((p, i % 2))
    # and one PNG exercising the PIL fallback inside _build
    p = str(tmp_path / "s4.png")
    Image.fromarray(_rand_img(rs, 72, 72)).save(p)
    pairs.append((p, 0))

    ds = PackedCache(str(tmp_path / "cache")).build_or_open(pairs, 64)
    assert ds.images.shape == (5, 64, 64, 3)
    for i, (path, _) in enumerate(pairs):
        ref = np.asarray(
            Image.open(path).convert("RGB").resize((64, 64), Image.BILINEAR))
        assert np.abs(ds.images[i].astype(int) - ref.astype(int)).max() <= 2


def test_packed_cache_chunked_decode(tmp_path, monkeypatch):
    """Pack builds must decode in bounded chunks (a real split would not
    fit in host RAM whole): force a tiny chunk budget and verify identical
    output incl. PIL-fallback rows interleaved across chunks."""
    from moma_tpu.data import histo as H

    monkeypatch.setattr(H, "DECODE_CHUNK_BYTES", 2 * 64 * 64 * 3)  # 2 rows
    rs = np.random.RandomState(7)
    pairs = []
    for i in range(7):
        ext = "png" if i in (1, 5) else "jpg"  # fallbacks in two chunks
        p = str(tmp_path / f"c{i}.{ext}")
        Image.fromarray(_rand_img(rs, 72, 72)).save(p)
        pairs.append((p, i % 3))
    ds = H.PackedCache(str(tmp_path / "cache")).build_or_open(pairs, 64)
    assert ds.images.shape == (7, 64, 64, 3)
    for i, (path, _) in enumerate(pairs):
        ref = np.asarray(
            Image.open(path).convert("RGB").resize((64, 64), Image.BILINEAR))
        assert np.abs(ds.images[i].astype(int) - ref.astype(int)).max() <= 2, i
