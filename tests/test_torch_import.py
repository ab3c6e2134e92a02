"""Forward-parity after torch->flax weight conversion: load the REFERENCE
model's random-init state dict into our Flax backbone and require
numerically matching logits + features (eval mode).  This is the strongest
architecture-equivalence evidence short of training parity, and validates
the cross-framework checkpoint path (model_def.py capability)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.models import create_model
from moma_tpu.models.torch_import import convert_state_dict

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not available",
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


def _compare(name, torch_model, image_hw, atol=2e-4):
    torch_model.eval()
    x = np.random.RandomState(0).rand(2, 3, image_hw, image_hw).astype(np.float32)
    with torch.no_grad():
        tfeats, tlogits = torch_model(torch.from_numpy(x), is_feat=True)

    jm = create_model(name, num_classes=tlogits.shape[1])
    variables = jm.init(
        jax.random.PRNGKey(0), jnp.zeros((2, image_hw, image_hw, 3)), train=False
    )
    converted = convert_state_dict(
        {k: v.numpy() for k, v in torch_model.state_dict().items()}, variables
    )
    jfeats, jlogits = jm.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(jlogits), tlogits.numpy(), atol=atol, rtol=1e-3
    )
    # pooled embedding too (drives every feature-KD loss)
    np.testing.assert_allclose(
        np.asarray(jfeats[-1]).reshape(2, -1),
        tfeats[-1].numpy().reshape(2, -1),
        atol=atol, rtol=1e-3,
    )


def test_resnet20_forward_parity():
    import models.resnet as ref

    _compare("resnet20", ref.resnet20(num_classes=100), 32)


def test_resnet32x4_forward_parity():
    import models.resnet as ref

    _compare("resnet32x4", ref.resnet32x4(num_classes=100), 32)


def test_vgg8_forward_parity():
    from models.vgg import vgg8_bn

    _compare("vgg8", vgg8_bn(num_classes=100), 32)


def test_mobilenetv2_forward_parity():
    from models.mobilenetv2 import mobile_half

    _compare("MobileNetV2", mobile_half(100), 32)


def test_shufflev2_forward_parity():
    from models.ShuffleNetv2 import ShuffleV2

    _compare("ShuffleV2", ShuffleV2(num_classes=100), 32)


def test_resnet18_imagenet_forward_parity():
    from models.resnet_imagenet import resnet18

    _compare("ResNet18", resnet18(num_classes=50), 64)


def test_efficientnet_b0_forward_parity():
    from models.efficientnet_pytorch.model import efficientnet

    tm = efficientnet(
        task_mode="class", model_name="efficientnet-b0",
        pretrained=False, num_classes=37,
    )
    # effiB0 uses swish + SE; slightly looser tolerance for exp chains
    _compare("effiB0", tm, 64, atol=5e-4)
