"""CIFAR MobileNetV2 (Flax, NHWC) — parity with models/mobilenetv2.py
(RCO variant: stem stride 2, 7 inverted-residual stages, 1x1 head conv,
avg-pool, single FC; features [f0 stem, f1 s2, f2 s3, f3 s5, f4 s7,
f5 pooled], mobilenetv2.py:125-153).

TPU note: depthwise convs use feature_group_count — XLA lowers these to
the VPU efficiently at these widths; the pointwise 1x1s are the MXU work.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import BatchNorm

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _fc_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.normal(key, shape, dtype) * 0.01


class _ConvBN(nn.Module):
    ch: int
    kernel: int = 3
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
            feature_group_count=self.groups, kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        y = _ConvBN(hidden, kernel=1, dtype=self.dtype)(x, train)
        y = _ConvBN(
            hidden, kernel=3, stride=self.stride, groups=hidden, dtype=self.dtype
        )(y, train)
        y = _ConvBN(self.oup, kernel=1, relu=False, dtype=self.dtype)(y, train)
        if self.stride == 1 and inp == self.oup:
            return x + y
        return y


# (t, c, n, s) — mobilenetv2.py:76-84
_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 1),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2Cifar(nn.Module):
    num_classes: int = 100
    width_mult: float = 0.5
    expand_T: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width_mult
        x = _ConvBN(int(32 * w), kernel=3, stride=2, dtype=self.dtype)(x, train)
        f0 = x
        feats = [f0]
        setting = [
            (t if i == 0 else self.expand_T, c, n, s)
            for i, (t, c, n, s) in enumerate(_SETTING)
        ]
        # feature taps after stages 1, 2, 4, 6 (mobilenetv2.py:129-141)
        taps = {1, 2, 4, 6}
        for i, (t, c, n, s) in enumerate(setting):
            out_ch = int(c * w)
            for j in range(n):
                x = InvertedResidual(
                    out_ch, s if j == 0 else 1, t, dtype=self.dtype
                )(x, train)
            if i in taps:
                feats.append(x)
        last_ch = int(1280 * w) if w > 1.0 else 1280
        x = _ConvBN(last_ch, kernel=1, dtype=self.dtype)(x, train)
        f5 = jnp.mean(x, axis=(1, 2))
        feats.append(f5)
        logits = nn.Dense(
            self.num_classes, kernel_init=_fc_init,
            bias_init=nn.initializers.zeros, name="classifier",
        )(f5.astype(jnp.float32))
        return tuple(feats), logits


def mobile_half(num_classes: int = 100, dtype: Any = None, **kw):
    return MobileNetV2Cifar(num_classes=num_classes, width_mult=0.5,
                            dtype=dtype, **kw)


def mobile_half_double(num_classes: int = 100, dtype: Any = None, **kw):
    return MobileNetV2Cifar(num_classes=num_classes, width_mult=1.0,
                            dtype=dtype, **kw)
