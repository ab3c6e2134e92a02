"""CIFAR ResNet / wide-ResNet family (Flax, NHWC).

Capability parity with the reference's `models/resnet.py` (depth-6n+2
BasicBlock nets over widths [16,16,32,64] and the x2/x4 wide variants,
factories at resnet.py:188-260).  Feature contract (resnet.py:164-186):
feats = (f0 post-stem-relu, f1..f3 post-stage, f4 pooled), logits from fc.

Design is TPU-first: NHWC, fused conv+BN+relu left to XLA, static shapes.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

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
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=conv_kernel_init,
            dtype=self.dtype,
        )(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype,
            )(x)
            residual = BatchNorm(use_running_average=not train, dtype=self.dtype)(
                residual
            )
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * self.expansion
        residual = x
        y = nn.Conv(
            self.planes, (1, 1), use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=conv_kernel_init,
            dtype=self.dtype,
        )(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_ch, (1, 1), use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype,
            )(x)
            residual = BatchNorm(use_running_average=not train, dtype=self.dtype)(
                residual
            )
        return nn.relu(y + residual)


class ResNetCifar(nn.Module):
    """3-stage CIFAR ResNet; depth = 6n+2 (basic) or 9n+2 (bottleneck)."""

    depth: int
    num_filters: Sequence[int]
    block_name: str = "basicblock"
    num_classes: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block_name.lower() == "basicblock":
            assert (self.depth - 2) % 6 == 0, "basicblock depth must be 6n+2"
            n = (self.depth - 2) // 6
            block = BasicBlock
        elif self.block_name.lower() == "bottleneck":
            assert (self.depth - 2) % 9 == 0, "bottleneck depth must be 9n+2"
            n = (self.depth - 2) // 9
            block = Bottleneck
        else:
            raise ValueError(f"unknown block {self.block_name}")

        x = nn.Conv(
            self.num_filters[0], (3, 3), padding=1, use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        f0 = x

        feats = [f0]
        for stage, planes in enumerate(self.num_filters[1:]):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = block(planes, stride if i == 0 else 1, dtype=self.dtype)(
                    x, train=train
                )
            feats.append(x)

        f4 = global_avg_pool(x)
        feats.append(f4)
        # canonical name: SRRL/SimKD reuse the teacher classifier by key
        # (reference get_feat_modules()[-1], models/resnet.py:153-162)
        logits = TorchLinear(self.num_classes, name="classifier")(
            f4.astype(jnp.float32)
        )
        return tuple(feats), logits


def _factory(depth, widths, block="basicblock"):
    def make(num_classes: int = 100, dtype: Any = None, **kw):
        return ResNetCifar(
            depth=depth, num_filters=widths, block_name=block,
            num_classes=num_classes, dtype=dtype, **kw,
        )

    return make


W1 = (16, 16, 32, 64)
W2 = (16, 32, 64, 128)
W4 = (32, 64, 128, 256)

resnet8 = _factory(8, W1)
resnet14 = _factory(14, W1)
resnet20 = _factory(20, W1)
resnet32 = _factory(32, W1)
resnet38 = _factory(38, W1)  # aka wrn_40_1
resnet44 = _factory(44, W1)
resnet56 = _factory(56, W1)
resnet110 = _factory(110, W1)
resnet116 = _factory(116, W1)
resnet200 = _factory(200, W1)
resnet14x2 = _factory(14, W2)  # aka wrn_16_2
resnet38x2 = _factory(38, W2)  # aka wrn_40_2
resnet110x2 = _factory(110, W2)
resnet8x4 = _factory(8, W4)
resnet14x4 = _factory(14, W4)  # aka wrn_16_4
resnet20x4 = _factory(20, W4)
resnet26x4 = _factory(26, W4)
resnet32x4 = _factory(32, W4)
resnet38x4 = _factory(38, W4)  # aka wrn_40_4
resnet44x4 = _factory(44, W4)
resnet56x4 = _factory(56, W4)
resnet110x4 = _factory(110, W4)
