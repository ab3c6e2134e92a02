"""Pretrain resolution + cross-task transfer loading.

Covers the reference's --std_pre/--tec_pre surface:
  * preset tags -> checkpoint paths (model_def.py:15-49 hardcodes absolute
    author-machine paths; we resolve through $MOMA_PRETRAIN_REGISTRY /
    $MOMA_PRETRAIN_DIR instead) — unresolvable tags raise rather than
    silently training from scratch;
  * strict=False cross-task transfer from a torch .pth whose classifier has
    a DIFFERENT label width (the reference pops the classifier keys before
    loading, helper/util.py:156-159);
  * encoder-only dumps with extra projection-head linears (the ssl_ciga
    checkpoint shape, model_def.py:66-76).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.models import create_model
from moma_tpu.models.pretrained import (
    PretrainResolutionError,
    load_pretrained_params,
    resolve_pretrain,
)

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- resolve


def test_resolve_none_and_scratch_tags():
    assert resolve_pretrain(None) is None
    assert resolve_pretrain("NULL") is None
    assert resolve_pretrain("") is None


def test_resolve_existing_path_passthrough(tmp_path):
    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    assert resolve_pretrain(str(p)) == str(p)


def test_resolve_registry_json(tmp_path, monkeypatch):
    ckpt = tmp_path / "panda_teacher.pth"
    ckpt.write_bytes(b"x")
    reg = tmp_path / "registry.json"
    # relative path: resolved against the registry file's directory
    reg.write_text(json.dumps({"PANDA": "panda_teacher.pth"}))
    monkeypatch.setenv("MOMA_PRETRAIN_REGISTRY", str(reg))
    assert resolve_pretrain("PANDA") == str(ckpt)


def test_resolve_pretrain_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("MOMA_PRETRAIN_REGISTRY", raising=False)
    monkeypatch.setenv("MOMA_PRETRAIN_DIR", str(tmp_path))
    (tmp_path / "kather19.pth").write_bytes(b"x")
    assert resolve_pretrain("kather19") == str(tmp_path / "kather19.pth")
    # orbax-style directory form
    (tmp_path / "gastric_wsi").mkdir()
    assert resolve_pretrain("gastric_wsi") == str(tmp_path / "gastric_wsi")


def test_resolve_unknown_tag_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("MOMA_PRETRAIN_REGISTRY", raising=False)
    monkeypatch.setenv("MOMA_PRETRAIN_DIR", str(tmp_path))
    with pytest.raises(PretrainResolutionError, match="model_def.py"):
        resolve_pretrain("PANDA")  # known reference tag, not registered
    with pytest.raises(PretrainResolutionError):
        resolve_pretrain("no_such_preset")


# ------------------------------------------- cross-task transfer (.pth)


def _torch_ckpt(tmp_path, n_cls, wrap="model"):
    import models.resnet as ref

    tm = ref.resnet8(num_classes=n_cls)
    tm.eval()
    p = str(tmp_path / f"ck{n_cls}.pth")
    sd = tm.state_dict()
    torch.save({wrap: sd} if wrap else sd, p)
    return tm, p


def _init_flax(n_cls):
    jm = create_model("resnet8", num_classes=n_cls)
    variables = jm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    return jm, variables


def test_cross_task_strict_false_loads_backbone(tmp_path):
    tm, p = _torch_ckpt(tmp_path, n_cls=7)
    jm, variables = _init_flax(n_cls=4)
    init_cls = np.asarray(variables["params"]["classifier"]["kernel"])

    out = load_pretrained_params(variables, p, strict=False)

    # classifier stays at fresh init (4-wide) — the reference's
    # classifier-pop semantics for mismatched label spaces
    np.testing.assert_array_equal(
        np.asarray(out["params"]["classifier"]["kernel"]), init_cls
    )
    # backbone weights actually transferred: forward features match torch
    x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        tfeats, _ = tm(torch.from_numpy(x), is_feat=True)
    jfeats, _ = jm.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(jfeats[-1]).reshape(2, -1),
        tfeats[-1].numpy().reshape(2, -1),
        atol=2e-4, rtol=1e-3,
    )


def test_cross_task_strict_true_raises(tmp_path):
    _, p = _torch_ckpt(tmp_path, n_cls=7)
    _, variables = _init_flax(n_cls=4)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_params(variables, p, strict=True)


def test_encoder_only_dump_with_projection_head(tmp_path):
    """ssl_ciga shape: no classifier, extra trailing projection linears
    under a 'state_dict' wrapper (model_def.py:66-76)."""
    import collections

    import models.resnet as ref

    tm = ref.resnet8(num_classes=7)
    tm.eval()
    sd = collections.OrderedDict()
    for k, v in tm.state_dict().items():
        if not k.startswith("fc"):
            sd[k] = v
    # a 2-layer projection head appended after the encoder weights
    sd["head.0.weight"] = torch.randn(64, 64)
    sd["head.0.bias"] = torch.randn(64)
    sd["head.2.weight"] = torch.randn(128, 64)
    sd["head.2.bias"] = torch.randn(128)
    p = str(tmp_path / "ssl.ckpt")
    torch.save({"state_dict": sd}, p)

    jm, variables = _init_flax(n_cls=4)
    out = load_pretrained_params(variables, p, strict=False)

    x = np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        tfeats, _ = tm(torch.from_numpy(x), is_feat=True)
    jfeats, _ = jm.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(jfeats[-1]).reshape(2, -1),
        tfeats[-1].numpy().reshape(2, -1),
        atol=2e-4, rtol=1e-3,
    )


def test_tag_flows_through_load(tmp_path, monkeypatch):
    """--std_pre PANDA style: the tag resolves through the registry and the
    checkpoint loads end-to-end."""
    monkeypatch.delenv("MOMA_PRETRAIN_REGISTRY", raising=False)
    monkeypatch.setenv("MOMA_PRETRAIN_DIR", str(tmp_path))
    tm, p = _torch_ckpt(tmp_path, n_cls=4, wrap=None)
    os.rename(p, str(tmp_path / "PANDA.pth"))
    _, variables = _init_flax(n_cls=4)
    out = load_pretrained_params(variables, "PANDA", strict=True)
    fck = np.asarray(out["params"]["classifier"]["kernel"])
    np.testing.assert_allclose(
        fck, tm.state_dict()["fc.weight"].numpy().T, atol=1e-6
    )


def test_unresolvable_tag_raises_from_load(tmp_path, monkeypatch):
    monkeypatch.delenv("MOMA_PRETRAIN_REGISTRY", raising=False)
    monkeypatch.setenv("MOMA_PRETRAIN_DIR", str(tmp_path))
    _, variables = _init_flax(n_cls=4)
    with pytest.raises(PretrainResolutionError):
        load_pretrained_params(variables, "gastric_wsi_DDP", strict=False)
