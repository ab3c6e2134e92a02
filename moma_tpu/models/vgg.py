"""CIFAR VGG family (Flax, NHWC) — capability parity with the reference's
models/vgg.py (5 conv blocks, single FC classifier, feature contract
[f0..f4 post-block-relu, f5 pooled], vgg.py:56-84; configs :116-122).

Note the reference quirk kept here: pool3 is applied only for 64px inputs
(vgg.py:71-72), so at 32x32 blocks 3 and 4 share an 4x4 resolution.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import BatchNorm, global_avg_pool

CFGS = {
    "A": [[64], [128], [256, 256], [512, 512], [512, 512]],
    "B": [[64, 64], [128, 128], [256, 256], [512, 512], [512, 512]],
    "D": [[64, 64], [128, 128], [256, 256, 256], [512, 512, 512], [512, 512, 512]],
    "E": [
        [64, 64], [128, 128], [256, 256, 256, 256],
        [512, 512, 512, 512], [512, 512, 512, 512],
    ],
    "S": [[64], [128], [256], [512], [512]],
}

# reference init: conv ~ N(0, sqrt(2/(k*k*out))), fc ~ N(0, 0.01) (vgg.py:105-114)
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _fc_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.normal(key, shape, dtype) * 0.01


class _Block(nn.Module):
    widths: Sequence[int]
    batch_norm: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i, w in enumerate(self.widths):
            x = nn.Conv(
                w, (3, 3), padding=1, kernel_init=_conv_init,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
            )(x)
            if self.batch_norm:
                x = BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class VGG(nn.Module):
    cfg_name: str
    batch_norm: bool = False
    num_classes: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = CFGS[self.cfg_name]
        h = x.shape[1]
        feats = []
        for b, widths in enumerate(cfg):
            x = _Block(widths, self.batch_norm, dtype=self.dtype)(x, train=train)
            feats.append(x)
            if b < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif b == 3 and h == 64:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        f5 = global_avg_pool(x)
        feats.append(f5)
        logits = nn.Dense(
            self.num_classes, kernel_init=_fc_init,
            bias_init=nn.initializers.zeros, name="classifier",
        )(f5.astype(jnp.float32))
        return tuple(feats), logits


def _factory(cfg_name, batch_norm):
    def make(num_classes: int = 100, dtype: Any = None, **kw):
        return VGG(cfg_name=cfg_name, batch_norm=batch_norm,
                   num_classes=num_classes, dtype=dtype, **kw)

    return make


vgg8 = _factory("S", False)
vgg8_bn = _factory("S", True)
vgg11 = _factory("A", False)
vgg11_bn = _factory("A", True)
vgg13 = _factory("B", False)
vgg13_bn = _factory("B", True)
vgg16 = _factory("D", False)
vgg16_bn = _factory("D", True)
vgg19 = _factory("E", False)
vgg19_bn = _factory("E", True)
