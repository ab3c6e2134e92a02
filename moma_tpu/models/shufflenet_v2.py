"""CIFAR ShuffleNetV2 (Flax, NHWC) — parity with models/ShuffleNetv2.py:
1x1 stem to 24ch, 3 stages each starting with a DownBlock then split-based
BasicBlocks with channel shuffle, 1x1 head conv, features
[f0 stem, f1..f3 stages, f4 pooled] (ShuffleNetv2.py:140-161).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import BatchNorm, TorchLinear, conv_kernel_init
from moma_tpu.models.shufflenet_v1 import channel_shuffle


class _CBR(nn.Module):
    ch: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad, use_bias=False,
            feature_group_count=self.groups, kernel_init=conv_kernel_init,
            dtype=self.dtype,
        )(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """Split-half block (ShuffleNetv2.py:31-62), shuffle groups=2."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        y = _CBR(c, 1, dtype=self.dtype)(x2, train)
        y = _CBR(c, 3, groups=c, relu=False, dtype=self.dtype)(y, train)
        y = _CBR(c, 1, dtype=self.dtype)(y, train)
        out = jnp.concatenate([x1, y], axis=-1)
        return channel_shuffle(out, 2)


class DownBlock(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        mid = self.out_channels // 2
        # left: dw s2 -> 1x1
        l = _CBR(inp, 3, stride=2, groups=inp, relu=False, dtype=self.dtype)(x, train)
        l = _CBR(mid, 1, dtype=self.dtype)(l, train)
        # right: 1x1 -> dw s2 -> 1x1
        r = _CBR(mid, 1, dtype=self.dtype)(x, train)
        r = _CBR(mid, 3, stride=2, groups=mid, relu=False, dtype=self.dtype)(r, train)
        r = _CBR(mid, 1, dtype=self.dtype)(r, train)
        return channel_shuffle(jnp.concatenate([l, r], axis=-1), 2)


CONFIGS = {
    0.2: {"out_channels": (40, 80, 160, 512), "num_blocks": (3, 3, 3)},
    0.3: {"out_channels": (40, 80, 160, 512), "num_blocks": (3, 7, 3)},
    0.5: {"out_channels": (48, 96, 192, 1024), "num_blocks": (3, 7, 3)},
    1: {"out_channels": (116, 232, 464, 1024), "num_blocks": (3, 7, 3)},
    1.5: {"out_channels": (176, 352, 704, 1024), "num_blocks": (3, 7, 3)},
    2: {"out_channels": (224, 488, 976, 2048), "num_blocks": (3, 7, 3)},
}


class ShuffleNetV2Cifar(nn.Module):
    net_size: float = 1
    num_classes: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = CONFIGS[self.net_size]
        out_channels = cfg["out_channels"]
        num_blocks = cfg["num_blocks"]
        x = _CBR(24, 1, dtype=self.dtype)(x, train)
        feats = [x]
        for oc, nb in zip(out_channels[:3], num_blocks):
            x = DownBlock(oc, dtype=self.dtype)(x, train)
            for _ in range(nb):
                x = BasicBlock(dtype=self.dtype)(x, train)
            feats.append(x)
        x = _CBR(out_channels[3], 1, dtype=self.dtype)(x, train)
        f4 = jnp.mean(x, axis=(1, 2))
        feats.append(f4)
        logits = TorchLinear(self.num_classes, name="classifier")(
            f4.astype(jnp.float32)
        )
        return tuple(feats), logits


def _factory(size):
    def make(num_classes: int = 100, dtype: Any = None, **kw):
        return ShuffleNetV2Cifar(net_size=size, num_classes=num_classes,
                                 dtype=dtype, **kw)

    return make


ShuffleV2_0_2 = _factory(0.2)
ShuffleV2_0_5 = _factory(0.5)
ShuffleV2 = _factory(1)
ShuffleV2_1_5 = _factory(1.5)
ShuffleV2_2_0 = _factory(2)
