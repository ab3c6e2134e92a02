"""Serving export (core/export.py): StableHLO round-trip, symbolic batch,
parity with the live model, and the end-to-end train -> export -> predict
flow through the CLIs."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.export import ExportedClassifier, export_classifier
from moma_tpu.data import augment as aug
from moma_tpu.models import create_model


def test_export_round_trip_symbolic_batch(tmp_path):
    model = create_model("resnet8", num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
    )
    path = export_classifier(
        model.apply, variables, 32, str(tmp_path / "m"),
        normalize=aug.cifar_eval_normalize, meta={"n_cls": 10},
    )
    clf = ExportedClassifier(path)
    assert clf.meta["n_cls"] == 10

    rs = np.random.RandomState(1)
    for b in (1, 5, 16):  # symbolic batch: one artifact, any batch size
        x = rs.randint(0, 256, (b, 32, 32, 3), np.uint8)
        got = np.asarray(clf(x))
        # training-eval pipeline: raw uint8 into the normalize fn (it
        # divides by 255 for uint8 — the artifact must match exactly this)
        _, want = model.apply(
            variables, aug.cifar_eval_normalize(jnp.asarray(x)),
            train=False,
        )
        assert got.shape == (b, 10)
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=1e-4, atol=1e-4)

    # micro-batched host predict
    x = rs.randint(0, 256, (11, 32, 32, 3), np.uint8)
    preds = clf.predict(x, batch_size=4)
    assert preds.shape == (11,)


def test_export_cli_from_trained_run(tmp_path):
    """train (1 epoch) -> export best_acc -> reload -> predictions match
    the checkpointed model."""
    from moma_tpu.cli.export_model import main as export_main
    from moma_tpu.core.config import Config
    from moma_tpu.train.teacher import run_teacher

    cfg = Config()
    cfg.run.save_dir = str(tmp_path)
    cfg.run.epochs = 1
    cfg.run.print_freq = 1
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.model_s.name = "resnet8"
    cfg.model_s.n_cls = 10
    _, result = run_teacher(cfg, synthetic=True)

    out = str(tmp_path / "served")
    path = export_main([
        "--run", result["run_dir"], "--model", "resnet8", "--n_cls", "10",
        "--image_size", "32", "--out", out, "--verify",
    ])
    assert os.path.exists(path)
    clf = ExportedClassifier(path)
    x = np.random.RandomState(2).randint(0, 256, (4, 32, 32, 3), np.uint8)
    assert clf.predict(x).shape == (4,)


def test_export_data_parallel_serving(tmp_path, mesh8):
    """clf.shard(): the single-device artifact served data-parallel via
    shard_map over the 8-device mesh — per-row logits must match the
    single-device call, including the padded (non-divisible) path."""
    model = create_model("resnet8", num_classes=7)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
    )
    path = export_classifier(
        model.apply, variables, 32, str(tmp_path / "mp"),
        normalize=aug.cifar_eval_normalize, meta={"n_cls": 7},
    )
    single = ExportedClassifier(path)
    sharded = ExportedClassifier(path).shard(mesh8)

    rs = np.random.RandomState(3)
    for b in (16, 13):  # 13: pads to 16, slices back
        x = rs.randint(0, 256, (b, 32, 32, 3), np.uint8)
        want = np.asarray(single(x))
        got = np.asarray(sharded(x))
        assert got.shape == (b, 7)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_int8_flag_conflict_and_image_calibration(tmp_path):
    """--int8 + --int8_dynamic is a hard error (no silent precedence);
    --calib_images calibrates activation scales on real decoded images."""
    import pytest
    from PIL import Image

    from moma_tpu.cli.export_model import main as export_main

    with pytest.raises(SystemExit, match="pick ONE"):
        export_main(["--model", "resnet8", "--n_cls", "10",
                     "--image_size", "32", "--out", str(tmp_path / "x"),
                     "--int8", "--int8_dynamic"])

    rs = np.random.RandomState(0)
    for i in range(9):
        Image.fromarray(rs.randint(0, 256, (40, 40, 3), dtype=np.uint8)).save(
            tmp_path / f"c{i}.png")
    export_main(["--model", "resnet8", "--n_cls", "10", "--image_size", "32",
                 "--out", str(tmp_path / "m8"), "--int8",
                 "--calib_images", str(tmp_path / "c*.png"), "--verify"])
    assert ExportedClassifier(str(tmp_path / "m8")).meta["quantized"] == "int8"

    with pytest.raises(SystemExit, match="matched no files"):
        export_main(["--model", "resnet8", "--n_cls", "10",
                     "--image_size", "32", "--out", str(tmp_path / "y"),
                     "--int8", "--calib_images", str(tmp_path / "none*.jpg")])
