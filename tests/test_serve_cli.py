"""Serving CLI (cli/serve.py): artifact-only batch inference.

Covers the synthetic path, the file path (JPEG via native decoder with
PIL fallback + a PNG to force the fallback row), ragged-tail padding,
and agreement with the live model on the same pixels.
"""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.cli.export_model import main as export_main
from moma_tpu.cli.serve import main as serve_main
from moma_tpu.models import create_model


def _export(tmp_path, image_size=32):
    out = str(tmp_path / "artifact")
    export_main(["--model", "resnet8", "--n_cls", "10",
                 "--image_size", str(image_size), "--out", out])
    return out


def test_serve_synthetic(tmp_path):
    art = _export(tmp_path)
    out = str(tmp_path / "preds.csv")
    res = serve_main(["--artifact", art, "--synthetic", "10", "--bs", "4",
                      "--out", out])
    assert res["n"] == 10
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 10  # ragged tail (10 = 2*4 + 2) unpadded in output
    assert all(0 <= int(r["pred"]) < 10 for r in rows)
    assert all(len(r["top3"].split()) == 3 for r in rows)


def test_serve_files_match_live_model(tmp_path):
    from PIL import Image

    art = _export(tmp_path)
    rs = np.random.RandomState(7)
    imgs = rs.randint(0, 256, (5, 32, 32, 3), np.uint8)
    d = tmp_path / "imgs"
    os.makedirs(d)
    for i in range(4):
        Image.fromarray(imgs[i]).save(str(d / f"im{i}.jpg"), quality=95)
    # a PNG forces the native decoder's fail path -> PIL fallback row
    Image.fromarray(imgs[4]).save(str(d / "im4.png"))

    out = str(tmp_path / "preds.csv")
    serve_main(["--artifact", art, "--images", str(d / "*"), "--bs", "3",
                "--out", out])
    with open(out) as f:
        rows = {os.path.basename(r["name"]): int(r["pred"])
                for r in csv.DictReader(f)}
    assert len(rows) == 5

    # live-model predictions on the decoded-from-disk pixels
    model = create_model("resnet8", num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    from moma_tpu.data.histo import _decode_resize

    names = sorted(os.listdir(d))
    pix = np.stack([_decode_resize(str(d / n), 32) for n in names])
    _, logits = model.apply(v, jnp.asarray(pix, jnp.float32) / 255.0,
                            train=False)
    want = np.argmax(np.asarray(logits), -1)
    got = np.array([rows[n] for n in names])
    assert (got == want).mean() >= 0.8  # jpeg decoder rounding can flip
    # the PNG row decodes losslessly on both paths -> must agree exactly
    assert rows["im4.png"] == int(want[names.index("im4.png")])


def test_batch_stream_pool_recycling_and_order():
    """The overlapped decode stream: submission order preserved, the
    2-buffer pool recycles (>=3 batches), rows land in the right slots,
    and a worker exception surfaces in the consumer."""
    from moma_tpu.cli.serve import _batch_stream

    n, bs, size = 11, 2, 8
    src = np.arange(n * size * size * 3, dtype=np.uint8).reshape(
        n, size, size, 3)

    buf_ids = []

    def get(lo, hi, out):
        assert out is not None and out.shape[0] == hi - lo
        buf_ids.append(id(out.base if out.base is not None else out))
        out[:] = src[lo:hi]
        return out

    seen = []
    for lo, hi, imgs in _batch_stream(get, n, bs, size, file_mode=True):
        np.testing.assert_array_equal(imgs, src[lo:hi])
        seen.append((lo, hi))
    assert seen == [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10), (10, 11)]
    assert len(set(buf_ids)) == 2  # two pooled buffers, recycled

    def get_boom(lo, hi, out):
        if lo >= 4:
            raise RuntimeError("decode failed")
        out[:] = src[lo:hi]
        return out

    stream = _batch_stream(get_boom, n, bs, size, file_mode=True)
    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in stream:
            pass


def test_serve_many_batches_files(tmp_path):
    """bs=2 over 9 files = 5 batches: exercises pool recycling + ragged
    tail + PIL-fallback rows interleaved with recycled buffers."""
    from PIL import Image

    art = _export(tmp_path)
    rs = np.random.RandomState(11)
    imgs = rs.randint(0, 256, (9, 32, 32, 3), np.uint8)
    d = tmp_path / "imgs9"
    os.makedirs(d)
    names = []
    for i in range(9):
        ext = "png" if i in (1, 6) else "jpg"  # two fallback rows
        p = str(d / f"im{i}.{ext}")
        Image.fromarray(imgs[i]).save(p, quality=95)
        names.append(os.path.basename(p))

    out = str(tmp_path / "preds9.csv")
    serve_main(["--artifact", art, "--images", str(d / "*"), "--bs", "2",
                "--out", out])
    with open(out) as f:
        rows = {os.path.basename(r["name"]): int(r["pred"])
                for r in csv.DictReader(f)}
    assert len(rows) == 9

    from moma_tpu.data.histo import _decode_resize

    model = create_model("resnet8", num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    ordered = sorted(names)
    pix = np.stack([_decode_resize(str(d / n), 32) for n in ordered])
    _, logits = model.apply(v, jnp.asarray(pix, jnp.float32) / 255.0,
                            train=False)
    want = np.argmax(np.asarray(logits), -1)
    got = np.array([rows[n] for n in ordered])
    # identical pixels on both paths (same decoders) -> exact agreement
    assert (got == want).all()
