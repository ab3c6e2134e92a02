"""CIFAR ShuffleNetV1 (Flax, NHWC) — parity with models/ShuffleNetv1.py:
1x1 stem to 24ch, 3 stages of grouped-1x1 / channel-shuffle / depthwise /
grouped-1x1 bottlenecks; stride-2 blocks concat an avg-pooled shortcut.
Features [f0 stem, f1..f3 stages, f4 pooled] (ShuffleNetv1.py:95-116).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import BatchNorm, TorchLinear, conv_kernel_init


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """NHWC channel shuffle (ShuffleNetv1.py:14-18)."""
    N, H, W, C = x.shape
    x = x.reshape(N, H, W, groups, C // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(N, H, W, C)


class _GroupedConv1x1(nn.Module):
    ch: int
    groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.ch, (1, 1), use_bias=False, feature_group_count=self.groups,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(x)


class Bottleneck(nn.Module):
    out_planes: int
    stride: int
    groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_planes = x.shape[-1]
        mid = self.out_planes // 4
        g = 1 if in_planes == 24 else self.groups
        y = _GroupedConv1x1(mid, g, dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(use_running_average=not train, dtype=self.dtype)(y))
        y = channel_shuffle(y, g)
        y = nn.Conv(
            mid, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, feature_group_count=mid,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(y)
        y = nn.relu(BatchNorm(use_running_average=not train, dtype=self.dtype)(y))
        y = _GroupedConv1x1(self.out_planes, self.groups, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.stride == 2:
            # torch AvgPool2d(count_include_pad=True default): padded zeros
            # count in the divisor — flax avg_pool with explicit padding
            # matches this (sum over window incl. pad, divided by 9)
            res = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            return nn.relu(jnp.concatenate([y, res], axis=-1))
        return nn.relu(y + x)


class ShuffleNetV1(nn.Module):
    num_classes: int = 100
    dtype: Any = None
    out_planes = (240, 480, 960)
    num_blocks = (4, 8, 4)
    groups: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(24, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype)(x)
        x = nn.relu(BatchNorm(use_running_average=not train, dtype=self.dtype)(x))
        feats = [x]
        in_planes = 24
        for op, nb in zip(self.out_planes, self.num_blocks):
            for i in range(nb):
                stride = 2 if i == 0 else 1
                cat_planes = in_planes if i == 0 else 0
                x = Bottleneck(
                    op - cat_planes, stride, self.groups, dtype=self.dtype
                )(x, train)
                in_planes = op
            feats.append(x)
        f4 = jnp.mean(x, axis=(1, 2))
        feats.append(f4)
        logits = TorchLinear(self.num_classes, name="classifier")(
            f4.astype(jnp.float32)
        )
        return tuple(feats), logits


def ShuffleV1(num_classes: int = 100, dtype: Any = None, **kw):
    return ShuffleNetV1(num_classes=num_classes, dtype=dtype, **kw)
