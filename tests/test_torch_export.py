"""Flax -> torch export (the inverse of torch_import): weights trained in
this framework load into the LIVE reference models and produce matching
logits — the "train here, evaluate/deploy there" migration direction.

Oracle evidence:
- round-trip bit-exactness: torch -> flax -> torch reproduces every
  tensor of the original state dict exactly;
- reference-side forward parity: OUR (random-init) weights exported into
  the reference model give the same logits the flax model computes;
- skip_classifier: cross-task export keeps the template's classifier.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.models import create_model
from moma_tpu.models.torch_import import (
    convert_state_dict, export_state_dict, save_torch_checkpoint)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not available",
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


def _ref_model(name, n_cls):
    if name == "resnet8":
        from models.resnet import resnet8

        return resnet8(num_classes=n_cls)
    if name == "vgg8":
        from models.vgg import vgg8_bn

        return vgg8_bn(num_classes=n_cls)
    if name == "effiB0":
        from models.efficientnet_pytorch.model import efficientnet

        return efficientnet(task_mode="class",
                            model_name="efficientnet-b0",
                            pretrained=False, num_classes=n_cls)
    raise KeyError(name)


def _flax_vars(name, n_cls, hw, seed=0):
    jm = create_model(name, num_classes=n_cls)
    variables = jm.init(
        jax.random.PRNGKey(seed), jnp.zeros((2, hw, hw, 3)), train=False)
    return jm, variables


@pytest.mark.parametrize("name,hw", [("resnet8", 32), ("effiB0", 64)])
def test_roundtrip_bit_exact(name, hw):
    tm = _ref_model(name, n_cls=7)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _, variables = _flax_vars(name, 7, hw)
    converted = convert_state_dict(sd, variables)
    back = export_state_dict(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        sd)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            back[k], sd[k], err_msg=f"round-trip drift at {k}")


@pytest.mark.parametrize("name,hw", [("resnet8", 32), ("vgg8", 32)])
def test_reference_runs_our_weights(name, hw):
    """Export OUR random-init weights into the live reference model; its
    logits must match the flax forward (eval mode, running stats)."""
    n_cls = 11
    jm, variables = _flax_vars(name, n_cls, hw, seed=3)
    tm = _ref_model(name, n_cls)
    template = tm.state_dict()
    sd = export_state_dict(variables, template)
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})
    tm.eval()

    x = np.random.RandomState(0).rand(2, 3, hw, hw).astype(np.float32)
    with torch.no_grad():
        _, tlogits = tm(torch.from_numpy(x), is_feat=True)
    _, jlogits = jm.apply(variables,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          train=False)
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), atol=2e-4, rtol=1e-4)


def test_skip_classifier_keeps_template_head():
    """Cross-task export: flax has 11 classes, template has 4 — the
    template's classifier survives untouched, the trunk is ours."""
    _, variables = _flax_vars("resnet8", 11, 32, seed=5)
    tm = _ref_model("resnet8", 4)
    template = tm.state_dict()
    sd = export_state_dict(variables, template, skip_classifier=True)
    np.testing.assert_array_equal(sd["fc.weight"], template["fc.weight"].numpy())
    np.testing.assert_array_equal(sd["fc.bias"], template["fc.bias"].numpy())
    # the trunk IS ours: first conv differs from the template's init
    assert not np.array_equal(
        sd["conv1.weight"], template["conv1.weight"].numpy())
    # and the result strict-loads into the reference model
    tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})


def test_export_without_skip_rejects_width_mismatch():
    _, variables = _flax_vars("resnet8", 11, 32)
    tm = _ref_model("resnet8", 4)
    with pytest.raises(ValueError, match="shape mismatch"):
        export_state_dict(variables, tm.state_dict())


def test_cli_and_reference_load(tmp_path):
    """End-to-end: export_torch CLI output loads through the REFERENCE'S
    OWN load_pretrained_weights (helper/util.py:141-162)."""
    from moma_tpu.cli.export_torch import main as export_main

    tm = _ref_model("resnet8", 10)
    template_path = tmp_path / "template.pth"
    torch.save(tm.state_dict(), str(template_path))
    out_path = tmp_path / "ours.pth"
    export_main(["--model", "resnet8", "--n_cls", "10", "--image_size",
                 "32", "--template", str(template_path), "--out",
                 str(out_path)])

    from helper.util import load_pretrained_weights

    loaded = load_pretrained_weights(tm, str(out_path), gpu=None,
                                     multiprocessing_distributed=False)
    loaded.eval()
    jm, variables = _flax_vars("resnet8", 10, 32, seed=0)
    x = np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        _, tlogits = loaded(torch.from_numpy(x), is_feat=True)
    _, jlogits = jm.apply(variables,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                          train=False)
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), atol=2e-4, rtol=1e-4)


def test_save_checkpoint_shape(tmp_path):
    """save_torch_checkpoint writes the reference's {'model': …} wrapper."""
    path = str(tmp_path / "w.pth")
    save_torch_checkpoint(path, {"a.weight": np.ones((2, 2), np.float32)},
                          meta={"epoch": 3})
    obj = torch.load(path, weights_only=False)
    assert obj["epoch"] == 3
    assert torch.equal(obj["model"]["a.weight"], torch.ones(2, 2))
