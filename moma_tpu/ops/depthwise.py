"""Depthwise convolution as shift-multiply-accumulate.

XLA's TPU lowering of grouped/depthwise convolutions is the classic
EfficientNet bottleneck; a kxk depthwise conv is just k^2 shifted
elementwise FMAs, which XLA fuses into a handful of VPU passes when
written that way.  Supports stride 1/2 with TF 'SAME' padding (the
EfficientNet requirement) on NHWC inputs.

The parameter layout matches flax nn.Conv's depthwise kernel
(kh, kw, 1, C) so torch checkpoint conversion (models/torch_import.py)
and parameter-count parity are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import conv_kernel_init


def depthwise_conv2d_shift_add(x: jax.Array, kernel: jax.Array,
                               stride: int = 1) -> jax.Array:
    """x (B,H,W,C), kernel (kh,kw,1,C); TF-SAME padding; NHWC out."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    w = kernel.reshape(kh, kw, C)

    out_h = -(-H // stride)
    out_w = -(-W // stride)
    pad_h = max((out_h - 1) * stride + kh - H, 0)
    pad_w = max((out_w - 1) * stride + kw - W, 0)
    pt, pb = pad_h // 2, pad_h - pad_h // 2
    pl_, pr = pad_w // 2, pad_w - pad_w // 2
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))

    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[:, dy : dy + (out_h - 1) * stride + 1 : stride,
                    dx : dx + (out_w - 1) * stride + 1 : stride, :]
            term = sl * w[dy, dx].astype(sl.dtype)
            acc = term if acc is None else acc + term
    return acc


class DepthwiseConv(nn.Module):
    """Drop-in depthwise conv module (no bias) using shift-add lowering."""

    features: int
    kernel_size: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", conv_kernel_init,
            (self.kernel_size, self.kernel_size, 1, self.features),
        )
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            x = x.astype(self.dtype)
        return depthwise_conv2d_shift_add(x, kernel, self.stride)
