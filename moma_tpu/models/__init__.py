"""Backbone registry — capability parity with `models/__init__.py:13-44`
plus the EfficientNet/ViT factories the reference wires through
`model_def.py`.  Lazy imports keep startup light; `create_model(name, ...)`
is the single construction entry point.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

# name -> (module, attribute)
_REGISTRY: Dict[str, tuple] = {
    # CIFAR ResNet / WRN family (models/resnet.py)
    **{
        name: ("moma_tpu.models.resnet_cifar", name)
        for name in [
            "resnet8", "resnet14", "resnet20", "resnet32", "resnet38",
            "resnet44", "resnet56", "resnet110", "resnet116", "resnet200",
            "resnet14x2", "resnet38x2", "resnet110x2",
            "resnet8x4", "resnet14x4", "resnet20x4", "resnet26x4",
            "resnet32x4", "resnet38x4", "resnet44x4", "resnet56x4",
            "resnet110x4",
        ]
    },
    # wrn aliases (reference comments resnet.py:200-246)
    "wrn_40_1": ("moma_tpu.models.resnet_cifar", "resnet38"),
    "wrn_16_2": ("moma_tpu.models.resnet_cifar", "resnet14x2"),
    "wrn_40_2": ("moma_tpu.models.resnet_cifar", "resnet38x2"),
    "wrn_16_4": ("moma_tpu.models.resnet_cifar", "resnet14x4"),
    "wrn_40_4": ("moma_tpu.models.resnet_cifar", "resnet38x4"),
    # VGG (models/vgg.py)
    "vgg8": ("moma_tpu.models.vgg", "vgg8_bn"),
    "vgg11": ("moma_tpu.models.vgg", "vgg11_bn"),
    "vgg13": ("moma_tpu.models.vgg", "vgg13_bn"),
    "vgg16": ("moma_tpu.models.vgg", "vgg16_bn"),
    "vgg19": ("moma_tpu.models.vgg", "vgg19_bn"),
    # CIFAR mobile/shuffle (models/mobilenetv2.py, ShuffleNetv1/2.py)
    "MobileNetV2": ("moma_tpu.models.mobilenetv2", "mobile_half"),
    "MobileNetV2_1_0": ("moma_tpu.models.mobilenetv2", "mobile_half_double"),
    "ShuffleV1": ("moma_tpu.models.shufflenet_v1", "ShuffleV1"),
    "ShuffleV2": ("moma_tpu.models.shufflenet_v2", "ShuffleV2"),
    "ShuffleV2_1_5": ("moma_tpu.models.shufflenet_v2", "ShuffleV2_1_5"),
    # ImageNet ResNets (models/resnet_imagenet.py)
    "ResNet18": ("moma_tpu.models.resnet_imagenet", "resnet18"),
    "ResNet34": ("moma_tpu.models.resnet_imagenet", "resnet34"),
    "ResNet50": ("moma_tpu.models.resnet_imagenet", "resnet50"),
    "resnet101": ("moma_tpu.models.resnet_imagenet", "resnet101"),
    "resnet152": ("moma_tpu.models.resnet_imagenet", "resnet152"),
    "resnext50_32x4d": ("moma_tpu.models.resnet_imagenet", "resnext50_32x4d"),
    "ResNet10x2": ("moma_tpu.models.resnet_imagenet", "wide_resnet10_2"),
    "ResNet18x2": ("moma_tpu.models.resnet_imagenet", "wide_resnet18_2"),
    "ResNet34x2": ("moma_tpu.models.resnet_imagenet", "wide_resnet34_2"),
    "wrn_50_2": ("moma_tpu.models.resnet_imagenet", "wide_resnet50_2"),
    # ImageNet mobile/shuffle
    "MobileNetV2_Imagenet": ("moma_tpu.models.mobilenetv2_imagenet", "mobilenet_v2"),
    "ShuffleV2_Imagenet": ("moma_tpu.models.shufflenet_v2_imagenet", "shufflenet_v2_x1_0"),
    # EfficientNet (models/efficientnet_pytorch/, the reference's workhorse)
    "effiB0": ("moma_tpu.models.efficientnet", "efficientnet_b0"),
    "effiB1": ("moma_tpu.models.efficientnet", "efficientnet_b1"),
    "effiB2": ("moma_tpu.models.efficientnet", "efficientnet_b2"),
    "effiB3": ("moma_tpu.models.efficientnet", "efficientnet_b3"),
    "effiB4": ("moma_tpu.models.efficientnet", "efficientnet_b4"),
    "effiB5": ("moma_tpu.models.efficientnet", "efficientnet_b5"),
    "effiB6": ("moma_tpu.models.efficientnet", "efficientnet_b6"),
    "effiB7": ("moma_tpu.models.efficientnet", "efficientnet_b7"),
    # ViT / DeiT (models/vits/)
    "vit_base_patch16_224": ("moma_tpu.models.vit", "vit_base_patch16_224"),
    "vit_tiny_patch16_224": ("moma_tpu.models.vit", "vit_tiny_patch16_224"),
    "vit_small_patch16_224": ("moma_tpu.models.vit", "vit_small_patch16_224"),
    "deit_base_patch16_224": ("moma_tpu.models.vit", "deit_base_patch16_224"),
    "deit_tiny_patch16_224": ("moma_tpu.models.vit", "deit_tiny_patch16_224"),
    "deit_small_patch16_224": ("moma_tpu.models.vit", "deit_small_patch16_224"),
    # 384-input ViT/DeiT (model_def.py:78-103; same modules, pos-embed
    # grid follows the init input size, npz loader resizes 224 ckpts)
    "vit_tiny_patch16_384": ("moma_tpu.models.vit", "vit_tiny_patch16_384"),
    "vit_base_patch16_384": ("moma_tpu.models.vit", "vit_base_patch16_384"),
    "deit_base_patch16_384": ("moma_tpu.models.vit", "deit_base_patch16_384"),
    "deit_tiny_patch16_384": ("moma_tpu.models.vit", "deit_tiny_patch16_384"),
    # timm-flavored names (model_def.py:92-94,107-109) — in the reference
    # these load timm's pretrained ViT; architecturally identical to the
    # vit_* factories here (weights come via torch_import/vit_npz instead)
    "vit_timm_base_patch16_224": ("moma_tpu.models.vit", "vit_base_patch16_224"),
    "vit_timm_tiny_patch16_224": ("moma_tpu.models.vit", "vit_tiny_patch16_224"),
    # Mixture-of-Experts ViTs (models/vit_moe.py) — TPU-native scaling
    # capability (no reference counterpart): top-k token-choice MoE MLPs,
    # expert-parallel over the 'model' mesh axis via --teacher_parallel
    # expert
    "vit_tiny_moe_patch16_224": ("moma_tpu.models.vit_moe", "vit_tiny_moe_patch16_224"),
    "vit_small_moe_patch16_224": ("moma_tpu.models.vit_moe", "vit_small_moe_patch16_224"),
}


def available_models():
    return sorted(_REGISTRY)


def create_model(name: str, num_classes: int, dtype: Any = None, **kw):
    """Instantiate a backbone by registry name (reference `model_dict[...]`)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {available_models()}")
    module, attr = _REGISTRY[name]
    factory = getattr(importlib.import_module(module), attr)
    return factory(num_classes=num_classes, dtype=dtype, **kw)
