"""ImageNet MobileNetV2 (Flax, NHWC) — torchvision architecture with the
reference's feature taps (mobilenetv2_imagenet.py:184-199: features
indices [0,1,4,7,14,18) then pooled): ReLU6, stem 32 s2, head 1280,
feats = (stem, stage to idx4, idx7, idx14, idx18/head, pooled).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import BatchNorm, TorchLinear, conv_kernel_init


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBNReLU6(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, feature_group_count=self.groups,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return _relu6(x) if self.relu else x


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = _ConvBNReLU6(hidden, 1, dtype=self.dtype)(y, train)
        y = _ConvBNReLU6(hidden, 3, self.stride, groups=hidden,
                         dtype=self.dtype)(y, train)
        y = _ConvBNReLU6(self.oup, 1, relu=False, dtype=self.dtype)(y, train)
        if self.stride == 1 and inp == self.oup:
            return x + y
        return y


_SETTING = [
    # t, c, n, s (torchvision)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2ImageNet(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):  # torchvision _make_divisible(ch * width, 8)
            v = int(ch * self.width_mult + 4) // 8 * 8
            v = max(8, v)
            if v < 0.9 * ch * self.width_mult:
                v += 8
            return v

        # torchvision features[] flat indexing: 0 stem, 1..17 blocks, 18
        # head conv.  Reference splits [0,1,4,7,14,18] (:188) tap the
        # outputs after features 0, 3, 6, 13, 17; the head-conv output is
        # NOT in the list; pooled embedding appended last (:196-198).
        x = _ConvBNReLU6(c(32), 3, 2, dtype=self.dtype)(x, train)
        out_feats = [x]
        taps_after = {3, 6, 13, 17}
        block_index = 1
        for t, ch, n, s in _SETTING:
            for i in range(n):
                x = InvertedResidual(c(ch), s if i == 0 else 1, t,
                                     dtype=self.dtype)(x, train)
                if block_index in taps_after:
                    out_feats.append(x)
                block_index += 1
        x = _ConvBNReLU6(c(1280) if self.width_mult > 1.0 else 1280, 1,
                         dtype=self.dtype)(x, train)
        pooled = jnp.mean(x, axis=(1, 2))
        out_feats.append(pooled)
        logits = TorchLinear(self.num_classes, name="classifier")(
            pooled.astype(jnp.float32)
        )
        return tuple(out_feats), logits


def mobilenet_v2(num_classes: int = 1000, dtype: Any = None, pretrained=False, **kw):
    return MobileNetV2ImageNet(num_classes=num_classes, dtype=dtype, **kw)
