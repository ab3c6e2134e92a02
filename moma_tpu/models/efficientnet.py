"""EfficientNet B0-B7 (Flax, NHWC) — the reference's workhorse backbone
(effiB0 default everywhere; models/efficientnet_pytorch/).

Parity targets:
  * arch: stem s2 -> 16 MBConv blocks (expand 1x1, depthwise SAME-pad, SE
    squeeze on INPUT filters, project 1x1, drop-connect + skip) -> 1x1
    head -> pool -> Dropout+Linear (model.py:27-131, 212-216)
  * round_filters / round_repeats with divisor 8 (utils.py:126-151)
  * BN momentum 0.99 / eps 1e-3 (TF defaults the port keeps)
  * feature contract: endpoints = pre-reduction maps (4 for 224/512 input)
    + head map + pooled embedding (model.py:248-298, 344-374); s_dim=1280
  * same-padding: flax 'SAME' == TF SAME == the port's static same-pad
    computed per image size (utils.py:196-341)

TPU-first notes: swish (silu) fuses into the convs under XLA (the torch
port needs a custom autograd for memory; remat here is `jax.checkpoint`
if ever needed); depthwise convs lower to VPU ops; the 1x1 expand/project
convs are the MXU hot path at 512x512 histo resolution.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import TorchLinear, conv_kernel_init


class BlockArgs(NamedTuple):
    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: float


# b0 baseline blocks (utils.py arch strings r1_k3_s11_e1_i32_o16_se0.25 ...)
B0_BLOCKS = (
    BlockArgs(1, 3, 1, 1, 32, 16, 0.25),
    BlockArgs(2, 3, 2, 6, 16, 24, 0.25),
    BlockArgs(2, 5, 2, 6, 24, 40, 0.25),
    BlockArgs(3, 3, 2, 6, 40, 80, 0.25),
    BlockArgs(3, 5, 1, 6, 80, 112, 0.25),
    BlockArgs(4, 5, 2, 6, 112, 192, 0.25),
    BlockArgs(1, 3, 1, 6, 192, 320, 0.25),
)

# (width_coeff, depth_coeff, resolution, dropout) — utils.py:463-534
COEFFS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

BN_MOMENTUM = 0.99  # torch port: momentum=1-0.99 (utils: batch_norm_momentum)
BN_EPS = 1e-3


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """utils.py:126-143 — width-scale then snap to divisor, never <90%."""
    if width == 1.0:
        return filters
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def drop_connect(x: jax.Array, rng: jax.Array, rate: float) -> jax.Array:
    """Per-sample stochastic depth (utils.py:164-183)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return x / keep * mask.astype(x.dtype)


class _StemConv(nn.Module):
    """Space-to-depth folded stem conv (layout probe, VERDICT r3 #8).

    Mathematically the SAME op as the standard stem (3x3 stride-2 SAME
    conv on (H, W, 3)) — the parameter stays the original (3,3,3,C)
    `kernel` (checkpoint/converter compatible) and is folded at trace
    time into an equivalent 2x2 stride-1 conv on the space-to-depth
    packed input:

      s2d=2: (H/2, W/2, 12) -> 2x2 s1 -> (H/2, W/2, C)
      s2d=4: (H/4, W/4, 48) -> 2x2 s1 -> (H/4, W/4, 4C) -> depth-to-space

    Rationale: C=3 and C=32 tensors sit in lane-padded / batch-minor
    layouts on TPU (BASELINE.md layout lore); packing spatial into
    channels moves the stem's operands toward full 128-lane tiles.
    Opt-in via EfficientNet(stem_s2d=...); output is bit-near (same
    dot contractions reassociated).
    """

    features: int
    s2d: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", conv_kernel_init,
                            (3, 3, x.shape[-1], self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        f, c_in, co = self.s2d, x.shape[-1], self.features
        # the folded kernel is exact only when H/W divide the packing
        # factor; silently truncating would diverge from the standard stem
        assert x.shape[1] % f == 0 and x.shape[2] % f == 0, (
            f"stem_s2d={f} needs H,W divisible by {f}; got {x.shape[1:3]}")
        b, h, w = x.shape[0], x.shape[1] // f, x.shape[2] // f
        # pack (dy, dx, c) onto channels
        xs = x.reshape(b, h, f, w, f, c_in).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h, w, f * f * c_in)
        if f == 2:
            # Wf[KY,KX,(dy,dx,c),o] = W[2KY+dy, 2KX+dx, c, o] (zeros past 3)
            wp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            wf = wp.reshape(2, 2, 2, 2, c_in, co).transpose(0, 2, 1, 3, 4, 5)
            wf = wf.reshape(2, 2, 4 * c_in, co)
            y = jax.lax.conv_general_dilated(
                xs, wf, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y
        assert f == 4
        # output (qy,qx,o) per packed pixel: ky = 4KY+dy-2qy must be in
        # [0,3) — build the folded kernel by gathering with a zero guard
        wf = jnp.zeros((2, 2, 16 * c_in, 4 * co), kernel.dtype)
        for ky_blk in range(2):          # KY
            for dy in range(4):
                for kx_blk in range(2):  # KX
                    for dx in range(4):
                        for qy in range(2):
                            for qx in range(2):
                                ky = 4 * ky_blk + dy - 2 * qy
                                kx = 4 * kx_blk + dx - 2 * qx
                                if 0 <= ky < 3 and 0 <= kx < 3:
                                    wf = wf.at[
                                        ky_blk, kx_blk,
                                        (dy * 4 + dx) * c_in:
                                        (dy * 4 + dx + 1) * c_in,
                                        (qy * 2 + qx) * co:
                                        (qy * 2 + qx + 1) * co,
                                    ].set(kernel[ky, kx])
        y = jax.lax.conv_general_dilated(
            xs, wf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # depth-to-space (qy, qx, o) -> spatial
        y = y.reshape(b, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, co)


class _BN(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        # fused (Pallas-reduction) BatchNorm — nn.BatchNorm numerics and
        # variable tree, child name kept for checkpoint/import parity
        from moma_tpu.ops.fused_bn import FusedBatchNorm

        return FusedBatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="BatchNorm_0",
        )(x)


class MBConvBlock(nn.Module):
    """MBConv with SE + drop-connect (model.py:27-131)."""

    in_filters: int
    out_filters: int
    kernel_size: int
    stride: int
    expand_ratio: int
    se_ratio: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool, drop_rate: float = 0.0,
                 rng: jax.Array | None = None):
        inp = x
        expanded = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(expanded, (1, 1), use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.silu(x)
        # depthwise, TF SAME padding.  Measured on v5e: XLA's native
        # grouped-conv lowering beats a shift-add formulation 2.6x here
        # (the shift-add backward turns into strided scatter-adds); see
        # ops/depthwise.py for the alternative and BASELINE.md for numbers.
        x = nn.Conv(
            expanded, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=expanded, use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(x)
        x = _BN(self.dtype)(x, train)
        x = nn.silu(x)
        # squeeze-excite on INPUT filter count (model.py:58-63)
        if self.se_ratio > 0:
            squeezed = max(1, int(self.in_filters * self.se_ratio))
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.Conv(squeezed, (1, 1), kernel_init=conv_kernel_init,
                        dtype=self.dtype)(s)
            s = nn.silu(s)
            s = nn.Conv(expanded, (1, 1), kernel_init=conv_kernel_init,
                        dtype=self.dtype)(s)
            x = jax.nn.sigmoid(s) * x
        x = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        x = _BN(self.dtype)(x, train)
        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and drop_rate > 0 and rng is not None:
                x = drop_connect(x, rng, drop_rate)
            x = x + inp
        return x


class EfficientNet(nn.Module):
    """Feature contract (model.py:344-374): feats = (reduction_1..4, head
    map, pooled 1280-d embedding); logits via Dropout+Linear."""

    variant: str = "b0"
    num_classes: int = 1000
    drop_connect_rate: float = 0.2
    dtype: Any = None
    # layout probe (VERDICT r3 #8): 0 = standard stem; 2/4 = space-to-
    # depth folded stem (see _StemConv).  Same math, same param tree.
    stem_s2d: int = 0
    # per-block rematerialization: each MBConvBlock recomputes its
    # interior (6x expand / depthwise / SE) in the backward, holding
    # only block-boundary activations.  The coarse full-forward
    # jax.checkpoint (RunConfig.remat) does NOT reduce peak memory —
    # the replay materializes the whole activation set again before the
    # backward consumes it (measured: f32 BS128@512 OOMs either way
    # without this).  Param tree unchanged.
    block_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, _res, dropout = COEFFS[self.variant]
        blocks = []
        for ba in B0_BLOCKS:
            blocks.append(
                ba._replace(
                    input_filters=round_filters(ba.input_filters, width),
                    output_filters=round_filters(ba.output_filters, width),
                    num_repeat=round_repeats(ba.num_repeat, depth),
                )
            )
        total_blocks = sum(b.num_repeat for b in blocks)

        stem_ch = round_filters(32, width)
        if self.stem_s2d:
            # explicit name keeps the param path identical to the
            # auto-named nn.Conv of the standard stem
            x = _StemConv(stem_ch, self.stem_s2d, dtype=self.dtype,
                          name="Conv_0")(x)
        else:
            x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="Conv_0")(x)
        x = _BN(self.dtype)(x, train)
        x = nn.silu(x)

        endpoints = []
        prev = x
        idx = 0
        if train:
            dc_rng = self.make_rng("dropout") if self.has_rng("dropout") else None
        else:
            dc_rng = None
        for ba in blocks:
            for r in range(ba.num_repeat):
                in_f = ba.input_filters if r == 0 else ba.output_filters
                stride = ba.stride if r == 0 else 1
                rate = self.drop_connect_rate * idx / total_blocks
                brng = (
                    jax.random.fold_in(dc_rng, idx) if dc_rng is not None else None
                )
                # flax static_argnums count the module as argument 0
                blk_cls = (
                    nn.checkpoint(MBConvBlock, static_argnums=(2, 3))
                    if self.block_remat else MBConvBlock
                )
                # nn.checkpoint renames the class (CheckpointMBConvBlock),
                # which would shift auto-names and break the param tree vs
                # the standard model — pin the standard auto-name explicitly
                x = blk_cls(
                    in_f, ba.output_filters, ba.kernel_size, stride,
                    ba.expand_ratio, ba.se_ratio, dtype=self.dtype,
                    name=f"MBConvBlock_{idx}",
                )(x, train, rate, brng)
                # endpoint = pre-reduction map (model.py:283-285)
                if prev.shape[1] > x.shape[1]:
                    endpoints.append(prev)
                prev = x
                idx += 1

        head_ch = round_filters(1280, width)
        x = nn.Conv(head_ch, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="Conv_1")(x)
        x = _BN(self.dtype)(x, train)
        x = nn.silu(x)
        endpoints.append(x)

        pooled = jnp.mean(x, axis=(1, 2))
        endpoints.append(pooled)
        z = pooled.astype(jnp.float32)
        if train and dropout > 0:
            z = nn.Dropout(rate=dropout, deterministic=not self.has_rng("dropout"))(z)
        logits = TorchLinear(self.num_classes, name="classifier")(z)
        return tuple(endpoints), logits


def _factory(variant):
    def make(num_classes: int = 1000, dtype: Any = None, **kw):
        return EfficientNet(variant=variant, num_classes=num_classes,
                            dtype=dtype, **kw)

    return make


efficientnet_b0 = _factory("b0")
efficientnet_b1 = _factory("b1")
efficientnet_b2 = _factory("b2")
efficientnet_b3 = _factory("b3")
efficientnet_b4 = _factory("b4")
efficientnet_b5 = _factory("b5")
efficientnet_b6 = _factory("b6")
efficientnet_b7 = _factory("b7")
