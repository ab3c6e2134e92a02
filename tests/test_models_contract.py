"""Feature-list contract tests for the backbone zoo.

The reference's only 'tests' were __main__ smoke blocks printing feature
shapes (models/resnet.py:259-274 etc.); this is the systematic version:
every registered backbone must return (feats, logits) with the documented
shapes and the pooled embedding last.
"""

import jax
import jax.numpy as jnp
import pytest

from moma_tpu.models import create_model

CIFAR_CASES = [
    # (name, feat channels f0..f3, pooled dim)
    ("resnet8", (16, 16, 32, 64), 64),
    ("resnet20", (16, 16, 32, 64), 64),
    ("resnet32", (16, 16, 32, 64), 64),
    ("resnet8x4", (32, 64, 128, 256), 256),
    ("resnet32x4", (32, 64, 128, 256), 256),
    ("wrn_16_2", (16, 32, 64, 128), 128),
    ("wrn_40_2", (16, 32, 64, 128), 128),
]


@pytest.mark.parametrize("name,chans,pooled", CIFAR_CASES)
def test_cifar_resnet_feature_contract(name, chans, pooled):
    model = create_model(name, num_classes=100)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (feats, logits) = model.apply(variables, x, train=False)

    assert logits.shape == (2, 100)
    # f0 stem, f1..f3 stages, f4 pooled (reference resnet.py:164-186)
    assert len(feats) == 5
    spatial = [32, 32, 16, 8]
    for f, c, s in zip(feats[:4], chans, spatial):
        assert f.shape == (2, s, s, c), f"{name}: {f.shape} != (2,{s},{s},{c})"
    assert feats[-1].shape == (2, pooled)


def test_train_mode_updates_batch_stats():
    model = create_model("resnet8", num_classes=10)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # running stats must move away from init (mean 0)
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_param_count_resnet20():
    # reference CIFAR resnet20 has ~0.278M params (well-known figure);
    # matching the count pins down the architecture.
    model = create_model("resnet20", num_classes=100)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 0.27e6 < n < 0.29e6, n


def test_bf16_compute_dtype():
    model = create_model("resnet8", num_classes=10, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats, logits = model.apply(variables, x, train=False)
    # params stay fp32, logits are cast to fp32 for the loss
    assert logits.dtype == jnp.float32
    assert feats[0].dtype == jnp.bfloat16


REFERENCE_MODEL_DICT = [
    # models/__init__.py:13-44 verbatim keys
    "resnet38", "resnet110", "resnet116", "resnet14x2", "resnet38x2",
    "resnet110x2", "resnet8x4", "resnet14x4", "resnet32x4", "resnet38x4",
    "vgg8", "vgg13", "MobileNetV2", "MobileNetV2_1_0", "ShuffleV1",
    "ShuffleV2", "ShuffleV2_1_5", "ResNet18", "ResNet34", "ResNet50",
    "resnet101", "resnext50_32x4d", "ResNet10x2", "ResNet18x2",
    "ResNet34x2", "wrn_50_2", "MobileNetV2_Imagenet", "ShuffleV2_Imagenet",
]
MODEL_DEF_NAMES = [
    # model_def.py resolvable names (effiB0 :12, ViT/DeiT :78-108)
    "effiB0",
    "vit_base_patch16_224", "vit_tiny_patch16_224",
    "deit_base_patch16_224", "deit_tiny_patch16_224",
    "vit_base_patch16_384", "vit_tiny_patch16_384", "deit_base_patch16_384",
]


def test_registry_covers_reference_names():
    from moma_tpu.models import available_models

    have = set(available_models())
    missing = [n for n in REFERENCE_MODEL_DICT + MODEL_DEF_NAMES
               if n not in have]
    assert not missing, f"registry missing reference names: {missing}"


def test_vit_384_pos_embed_grid():
    """384-input ViT: pos-embed grid must follow the init resolution
    (24x24 patches + cls = 577 tokens)."""
    model = create_model("vit_tiny_patch16_384", num_classes=5)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3)),
                   train=False)
    assert v["params"]["pos_embed"].shape == (1, 577, 192)
    feats, logits = model.apply(v, jnp.zeros((2, 384, 384, 3)), train=False)
    assert logits.shape == (2, 5)
