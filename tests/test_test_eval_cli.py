"""End-to-end tests for the bulk checkpoint evaluator CLI
(moma_tpu/cli/test_eval.py) — the reference test.py capability
(test.py:146-278), including its --models_dir/--csv_dir flag surface.
"""

import csv
import json
import os

import jax
import jax.numpy as jnp
import pytest

from moma_tpu.cli import test_eval
from moma_tpu.core.checkpoint import CheckpointManager
from moma_tpu.models import create_model


@pytest.fixture(scope="module")
def fake_runs(tmp_path_factory):
    """Two run dirs with best_acc checkpoints of a freshly-init resnet8
    (what train_teacher writes: {'params','batch_stats','opt_state','step'})."""
    root = tmp_path_factory.mktemp("runs")
    model = create_model("resnet8", num_classes=4)
    names = []
    for i, name in enumerate(["teacher_a", "teacher_b"]):
        v = model.init(jax.random.PRNGKey(i),
                       jnp.zeros((2, 32, 32, 3)), train=False)
        run = root / name
        ckpt = CheckpointManager(str(run / "ckpt"))
        ckpt.save("best_acc",
                  {"params": v["params"], "batch_stats": v["batch_stats"],
                   "opt_state": {}, "step": 0},
                  {"epoch": 0, "val_acc": 25.0})
        ckpt.wait()
        names.append(name)
    return str(root), names


def _common(out):
    return ["--model", "resnet8", "--synthetic", "--batch_size", "32",
            "--image_size", "32", "--n_cls", "4", "--out", out]


def test_runs_glob_mode(fake_runs, tmp_path):
    root, names = fake_runs
    out = str(tmp_path / "stat.json")
    results = test_eval.main(["--runs", os.path.join(root, "teacher_*")]
                             + _common(out))
    assert sorted(results) == sorted(names)
    for r in results.values():
        assert 0.0 <= r["acc"] <= 100.0 and r["n"] > 0
    written = json.load(open(out))
    assert sorted(written) == sorted(names)


def test_models_dir_plus_csv_dir_mode(fake_runs, tmp_path):
    """Reference surface (test.py --models_dir/--csv_dir): the CSV holds
    run NAMES that resolve under models_dir."""
    root, names = fake_runs
    csv_path = tmp_path / "models.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name"])
        w.writeheader()
        w.writerow({"name": names[0]})
    out = str(tmp_path / "stat.json")
    results = test_eval.main(
        ["--models_dir", root, "--csv_dir", str(csv_path)] + _common(out))
    assert list(results) == [names[0]]


def test_models_dir_alone_evaluates_every_subdir(fake_runs, tmp_path):
    root, names = fake_runs
    out = str(tmp_path / "stat.json")
    results = test_eval.main(["--models_dir", root] + _common(out))
    assert sorted(results) == sorted(names)


def test_models_dir_descends_into_nested_run_dirs(fake_runs, tmp_path):
    """Our runners nest an auto-named run dir under --save_dir; a
    models_dir over a root of save_dirs must find the nested ckpt."""
    root, names = fake_runs
    nested_root = tmp_path / "save_root"
    for name in names:
        src = os.path.join(root, name, "ckpt")
        dst = nested_root / name / f"{name}_auto_trial0" / "ckpt"
        os.makedirs(os.path.dirname(dst))
        os.symlink(src, dst)
    out = str(tmp_path / "stat.json")
    results = test_eval.main(["--models_dir", str(nested_root)] + _common(out))
    assert sorted(results) == sorted(names)


def test_csv_name_resolves_through_wildcard_level(fake_runs, tmp_path):
    """Reference test.py:206 globs {models_dir}/*/{name} — CSV names one
    wildcard level below models_dir must still resolve."""
    root, names = fake_runs
    wild_root = tmp_path / "wild_root"
    dst = wild_root / "groupX" / names[0]
    os.makedirs(os.path.dirname(dst))
    os.symlink(os.path.join(root, names[0]), dst)
    csv_path = tmp_path / "wild.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name"])
        w.writeheader()
        w.writerow({"name": names[0]})
    out = str(tmp_path / "stat.json")
    results = test_eval.main(
        ["--models_dir", str(wild_root), "--csv_dir", str(csv_path)]
        + _common(out))
    assert list(results) == [names[0]]


def test_missing_ckpt_tag_is_skipped(fake_runs, tmp_path):
    root, names = fake_runs
    out = str(tmp_path / "stat.json")
    results = test_eval.main(
        ["--runs", os.path.join(root, "teacher_*"), "--ckpt_tag", "best_f1"]
        + _common(out))
    assert results == {}


def test_model_path_save_alias(fake_runs, tmp_path):
    """Reference surface (test.py:62 --model_path 'where to save'): the
    stat JSON lands under it when --out is not given."""
    root, names = fake_runs
    save_dir = str(tmp_path / "save_here")
    args = ["--runs", os.path.join(root, "teacher_a"),
            "--model", "resnet8", "--synthetic", "--batch_size", "32",
            "--image_size", "32", "--n_cls", "4", "--model_path", save_dir]
    results = test_eval.main(args)
    assert list(results) == ["teacher_a"]
    written = json.load(open(os.path.join(save_dir, "test_stat.json")))
    assert list(written) == ["teacher_a"]
