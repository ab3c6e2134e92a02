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
