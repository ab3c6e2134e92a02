"""ImageNet ShuffleNetV2 (Flax, NHWC) — torchvision architecture with the
reference's feature taps (shuffleNetv2_imagenet.py:148-167: post-maxpool,
stage2, stage3, conv5-after-stage4, pooled).
"""

from __future__ import annotations

from typing import Any, Sequence

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
        x = nn.Conv(self.ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, feature_group_count=self.groups,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _Unit(nn.Module):
    """torchvision InvertedResidual: stride-1 split unit / stride-2 down
    unit (both branches), channel shuffle groups=2."""

    out_channels: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        branch = self.out_channels // 2
        if self.stride == 1:
            c = x.shape[-1] // 2
            x1, x2 = x[..., :c], x[..., c:]
            y = _CBR(branch, 1, dtype=self.dtype)(x2, train)
            y = _CBR(branch, 3, 1, groups=branch, relu=False,
                     dtype=self.dtype)(y, train)
            y = _CBR(branch, 1, dtype=self.dtype)(y, train)
            out = jnp.concatenate([x1, y], axis=-1)
        else:
            inp = x.shape[-1]
            l = _CBR(inp, 3, 2, groups=inp, relu=False, dtype=self.dtype)(x, train)
            l = _CBR(branch, 1, dtype=self.dtype)(l, train)
            r = _CBR(branch, 1, dtype=self.dtype)(x, train)
            r = _CBR(branch, 3, 2, groups=branch, relu=False,
                     dtype=self.dtype)(r, train)
            r = _CBR(branch, 1, dtype=self.dtype)(r, train)
            out = jnp.concatenate([l, r], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2ImageNet(nn.Module):
    stages_repeats: Sequence[int] = (4, 8, 4)
    stages_out: Sequence[int] = (24, 116, 232, 464, 1024)
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        so = self.stages_out
        x = _CBR(so[0], 3, 2, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [x]
        for stage, (reps, out_ch) in enumerate(zip(self.stages_repeats, so[1:4])):
            x = _Unit(out_ch, 2, dtype=self.dtype)(x, train)
            for _ in range(reps - 1):
                x = _Unit(out_ch, 1, dtype=self.dtype)(x, train)
            if stage < 2:
                feats.append(x)
        x = _CBR(so[4], 1, dtype=self.dtype)(x, train)
        feats.append(x)
        pooled = jnp.mean(x, axis=(1, 2))
        feats.append(pooled)
        logits = TorchLinear(self.num_classes, name="classifier")(
            pooled.astype(jnp.float32)
        )
        return tuple(feats), logits


_SIZES = {
    "x0_5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "x1_0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "x1_5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "x2_0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def _factory(size):
    reps, outs = _SIZES[size]

    def make(num_classes: int = 1000, dtype: Any = None, pretrained=False, **kw):
        return ShuffleNetV2ImageNet(
            stages_repeats=reps, stages_out=outs, num_classes=num_classes,
            dtype=dtype, **kw,
        )

    return make


shufflenet_v2_x0_5 = _factory("x0_5")
shufflenet_v2_x1_0 = _factory("x1_0")
shufflenet_v2_x1_5 = _factory("x1_5")
shufflenet_v2_x2_0 = _factory("x2_0")
