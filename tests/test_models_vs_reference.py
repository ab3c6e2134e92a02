"""Architecture parity vs the reference torch model zoo: parameter counts
and feature-list shapes must match exactly for every shared registry name.
Catches structural drift (wrong widths, missing blocks, downsample
mistakes) without weight-level comparison."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.models import create_model

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not available",
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

CIFAR_NAMES = [
    "resnet8", "resnet20", "resnet32", "resnet110", "resnet8x4", "resnet32x4",
    "resnet38x2", "vgg8", "vgg13", "MobileNetV2", "ShuffleV1", "ShuffleV2",
]
IMAGENET_NAMES = ["ResNet18", "ResNet50", "ResNet10x2", "resnext50_32x4d"]


def test_efficientnet_b0_parity():
    """effiB0 — the reference's default backbone everywhere: exact param
    count + endpoint shapes vs models/efficientnet_pytorch/model.py."""
    from models.efficientnet_pytorch.model import efficientnet

    tm = efficientnet(
        task_mode="class", model_name="efficientnet-b0",
        pretrained=False, num_classes=100,
    )
    tm.eval()
    with torch.no_grad():
        tfeats, tlog = tm(torch.zeros(1, 3, 224, 224), is_feat=True)
    jm = create_model("effiB0", num_classes=100)
    variables = jm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    jfeats, jlog = jm.apply(variables, jnp.zeros((1, 224, 224, 3)), train=False)
    assert len(jfeats) == len(tfeats) == 6
    for jf, tf in zip(jfeats[:-1], tfeats[:-1]):
        want = (tf.shape[0], tf.shape[2], tf.shape[3], tf.shape[1])
        assert tuple(jf.shape) == want
    # reference keeps pooled as (B,1280,1,1); ours is (B,1280) — same dim
    assert jfeats[-1].shape[-1] == tfeats[-1].shape[1] == 1280
    n_t = sum(p.numel() for p in tm.parameters())
    n_j = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert n_j == n_t, (n_j, n_t)


def _torch_model(name, n_cls):
    from models import model_dict

    if name in model_dict:
        return model_dict[name](num_classes=n_cls)
    # resnet8/20/32 etc. exist in models/resnet.py but are absent from the
    # reference registry (models/__init__.py:13-44)
    import models.resnet as ref_resnet

    return getattr(ref_resnet, name)(num_classes=n_cls)


def _count_torch(m):
    return sum(p.numel() for p in m.parameters()) + sum(
        b.numel()
        for n, b in m.named_buffers()
        if "running_mean" in n or "running_var" in n
    )


def _count_flax(variables):
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    n += sum(x.size for x in jax.tree_util.tree_leaves(variables["batch_stats"]))
    return n


@pytest.mark.parametrize("name", CIFAR_NAMES)
def test_cifar_param_and_shape_parity(name):
    n_cls = 100
    tm = _torch_model(name, n_cls)
    tm.eval()
    with torch.no_grad():
        tfeats, tlogits = tm(torch.zeros(2, 3, 32, 32), is_feat=True)

    jm = create_model(name, num_classes=n_cls)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False)
    jfeats, jlogits = jm.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)

    assert len(jfeats) == len(tfeats), (name, len(jfeats), len(tfeats))
    for jf, tf in zip(jfeats, tfeats):
        if tf.dim() == 4:
            want = (tf.shape[0], tf.shape[2], tf.shape[3], tf.shape[1])  # NCHW->NHWC
        else:
            want = tuple(tf.shape)
        assert tuple(jf.shape) == want, (name, tuple(jf.shape), want)
    assert tuple(jlogits.shape) == tuple(tlogits.shape)

    n_t = _count_torch(tm)
    n_j = _count_flax(variables)
    assert n_j == n_t, (name, n_j, n_t)


@pytest.mark.parametrize("name", IMAGENET_NAMES)
def test_imagenet_param_and_shape_parity(name):
    n_cls = 10
    tm = _torch_model(name, n_cls)
    tm.eval()
    with torch.no_grad():
        tfeats, tlogits = tm(torch.zeros(1, 3, 64, 64), is_feat=True)

    jm = create_model(name, num_classes=n_cls)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    jfeats, _ = jm.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)

    assert len(jfeats) == len(tfeats)
    for jf, tf in zip(jfeats, tfeats):
        if tf.dim() == 4:
            want = (tf.shape[0], tf.shape[2], tf.shape[3], tf.shape[1])
        else:
            want = tuple(tf.shape)
        assert tuple(jf.shape) == want, (name, tuple(jf.shape), want)

    assert _count_flax(variables) == _count_torch(tm), name
