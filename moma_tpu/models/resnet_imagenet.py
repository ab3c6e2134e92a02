"""ImageNet ResNet / ResNeXt / WideResNet family (Flax, NHWC).

Parity with models/resnet_imagenet.py (torchvision-style: 7x7 s2 stem,
3x3 s2 maxpool, 4 stages; features [f0 post-maxpool, f1..f4 stages,
f5 pooled], resnet_imagenet.py:227-251).  Wide BasicBlock variants scale
stage widths by base_width/64 (:155-156); Bottleneck wide/resnext variants
scale the bottleneck mid-width (torchvision semantics, :60-78).
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import (
    BatchNorm,
    TorchLinear,
    conv_kernel_init,
    global_avg_pool,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype)(x)
            x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        y = nn.Conv(width, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, feature_group_count=self.groups,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype)(x)
            x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(y + x)


class ResNetImageNet(nn.Module):
    block: Type[nn.Module]
    layers: Sequence[int]
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BasicBlock wide variants scale stage widths (:155-156)
        multiplier = (
            self.width_per_group // 64
            if (self.block is BasicBlock and self.width_per_group != 64)
            else 1
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [x]
        for stage, n in enumerate(self.layers):
            planes = int(64 * (2**stage) * multiplier)
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = self.block(
                    planes, stride if i == 0 else 1, self.groups,
                    self.width_per_group, dtype=self.dtype,
                )(x, train=train)
            feats.append(x)
        f5 = global_avg_pool(x)
        feats.append(f5)
        logits = TorchLinear(self.num_classes, name="classifier")(
            f5.astype(jnp.float32)
        )
        return tuple(feats), logits


def _factory(block, layers, groups=1, width_per_group=64):
    def make(num_classes: int = 1000, dtype: Any = None, pretrained=False, **kw):
        return ResNetImageNet(
            block=block, layers=layers, num_classes=num_classes,
            groups=groups, width_per_group=width_per_group, dtype=dtype, **kw,
        )

    return make


resnet18 = _factory(BasicBlock, (2, 2, 2, 2))
resnet34 = _factory(BasicBlock, (3, 4, 6, 3))
resnet50 = _factory(Bottleneck, (3, 4, 6, 3))
resnet101 = _factory(Bottleneck, (3, 4, 23, 3))
resnet152 = _factory(Bottleneck, (3, 8, 36, 3))
resnext50_32x4d = _factory(Bottleneck, (3, 4, 6, 3), groups=32, width_per_group=4)
resnext101_32x8d = _factory(Bottleneck, (3, 4, 23, 3), groups=32, width_per_group=8)
wide_resnet10_2 = _factory(BasicBlock, (1, 1, 1, 1), width_per_group=128)
wide_resnet18_2 = _factory(BasicBlock, (2, 2, 2, 2), width_per_group=128)
wide_resnet26_2 = _factory(BasicBlock, (3, 3, 3, 3), width_per_group=128)
wide_resnet34_2 = _factory(BasicBlock, (3, 4, 6, 3), width_per_group=128)
wide_resnet34_4 = _factory(BasicBlock, (3, 4, 6, 3), width_per_group=256)
wide_resnet50_2 = _factory(Bottleneck, (3, 4, 6, 3), width_per_group=128)
wide_resnet101_2 = _factory(Bottleneck, (3, 4, 23, 3), width_per_group=128)
