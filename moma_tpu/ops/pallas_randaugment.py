"""Pallas TPU kernel for one RandAugment layer (the augmentation hot path).

Measured on v5e at 512^2 x 64: the XLA staged implementation costs
~150 ms/layer because every stage round-trips HBM (LUT apply, enhance,
smooth, 27 roll-ladder steps for the warp).  This kernel keeps ONE image
(3,H,W) resident in VMEM and runs all four stages back-to-back per grid
step, so HBM traffic drops to read-once + write-once (~6 MB/image).

Split of responsibilities:
  outside (plain JAX, cheap):  histograms (one-hot MXU contraction),
      per-image LUT construction, all op-conditional scalar parameters
  kernel (per image):          x_int -> LUT apply (one-hot matmul in
      chunks) -> enhance blend (luma + in-kernel mean) -> PIL-SMOOTH
      sharpness blend -> 3-pass shear warp (static-roll binary ladder)
      -> clip + prob gate

Scalar layout per image (f32[16], SMEM):
  0 a_scale   1 b_luma   2 c_mean    3 sharp_f
  4 p1_slope  5 p1_center 6 p1_offset
  7 p2_slope  8 p2_center 9 p2_offset
  10 p3_slope 11 apply    12..14 fill RGB  15 (pad)
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moma_tpu.data import randaugment as RA

LUMA_R, LUMA_G, LUMA_B = 0.299, 0.587, 0.114


def _static_roll(x, shift: int, axis: int):
    """Static circular roll via slice+concat (Mosaic-friendly)."""
    if shift == 0:
        return x
    L = x.shape[axis]
    s = shift % L
    if s == 0:
        return x
    idx_hi = [slice(None)] * x.ndim
    idx_lo = [slice(None)] * x.ndim
    idx_hi[axis] = slice(s, L)
    idx_lo[axis] = slice(0, s)
    return jnp.concatenate([x[tuple(idx_hi)], x[tuple(idx_lo)]], axis=axis)


def _ladder_shift_2d(y, s_map, axis: int):
    """y (3,H,W); s_map (H,W) int32 positive roll amounts (constant along
    the shifted axis); shift along `axis` via binary ladder of static
    rolls.  All masks stay (H,W)->(1,H,W) rank-expansions (lane-preserving
    — Mosaic rejects lane-changing reshapes like (R,)->(1,R,1))."""
    L = y.shape[axis]
    n_stages = max(1, int(math.ceil(math.log2(L))))
    bit = 1
    for j in range(n_stages):
        use = (((s_map >> j) & 1) == 1)[None, :, :]
        rolled = _static_roll(y, bit, axis)
        y = jnp.where(use, rolled, y)
        bit *= 2
    return y


def _resample_pass(y, slope, center, offset, axis: int, fill_b):
    """One shear/translate pass on (3,H,W): src = i + slope*(r-center)+offset.
    axis=2: shift along W, amount varies per row; axis=1: along H, per col.
    fill_b: (3,H,W) fill planes."""
    C, H, W = y.shape
    row2d = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
    col2d = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
    if axis == 2:
        r2d, pos, L = row2d, col2d, W
    else:
        r2d, pos, L = col2d, row2d, H
    shift = slope * (r2d - center) + offset  # (H,W), constant along axis
    k = jnp.floor(shift)
    frac = (shift - k)[None, :, :]
    s_map = jnp.mod(k.astype(jnp.int32), L)
    y0 = _ladder_shift_2d(y, s_map, axis)
    y1 = _static_roll(y0, 1, axis)
    src0 = pos + k
    v0 = ((src0 >= 0) & (src0 <= L - 1))[None, :, :]
    v1 = ((src0 + 1 >= 0) & (src0 + 1 <= L - 1))[None, :, :]
    return (
        jnp.where(v0, y0, fill_b) * (1.0 - frac)
        + jnp.where(v1, y1, fill_b) * frac
    )


def _make_kernel(H: int, W: int):
    """Kernel for stages 2-4; stage 1 (hist+LUT) stays in XLA where the
    one-hot contraction is already fast and Mosaic's reshape rules block
    the in-kernel (R,W)->(N,1) flattening."""

    def kernel(scal_all_ref, y_ref, x_ref, o_ref):
        i = pl.program_id(0)

        def sc(j):
            return scal_all_ref[i, j]

        # original image for the prob gate, shipped bf16 (integers
        # 0..255 are exact in bf16; halves this block's VMEM)
        x = x_ref[0].astype(jnp.float32)
        # LUT-applied image, also bf16-exact integers (see _apply_lut)
        y = y_ref[0].astype(jnp.float32)  # (3,H,W)

        # ---- stage 2: enhance blend  out = a*y + b*round(luma) + c*mean_l
        a = sc(0)
        b = sc(1)
        c_mean = sc(2)
        luma = jnp.floor(
            LUMA_R * y[0] + LUMA_G * y[1] + LUMA_B * y[2] + 0.5
        )
        mean_l = jnp.floor(jnp.sum(luma) / (H * W) + 0.5)
        y = a * y + b * luma[None, :, :] + (c_mean * mean_l)

        # ---- stage 3: sharpness blend (PIL SMOOTH, border kept)
        sharp_f = sc(3)
        p = jnp.pad(y, ((0, 0), (1, 1), (1, 1)))
        acc = 5.0 * y
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                acc = acc + p[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
        sm = acc / 13.0
        row_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        border = (
            (row_i == 0) | (row_i == H - 1) | (col_i == 0) | (col_i == W - 1)
        )[None, :, :]
        sm = jnp.where(border, y, sm)
        y = sm + sharp_f * (y - sm)

        # ---- stage 4: 3-pass shear warp
        z = jnp.zeros((1, H, W), jnp.float32)
        fill_b = jnp.concatenate(
            [z + sc(12), z + sc(13), z + sc(14)], axis=0
        )
        y = _resample_pass(y, sc(4), sc(5), sc(6), 2, fill_b)
        y = _resample_pass(y, sc(7), sc(8), sc(9), 1, fill_b)
        cy = (H - 1) / 2.0
        y = _resample_pass(y, sc(10), cy, 0.0, 2, fill_b)

        # ---- clip + prob gate + inter-layer PIL rounding
        y = jnp.round(jnp.clip(y, 0.0, 255.0))
        gate = sc(11) > 0.5
        o_ref[0] = jnp.where(gate, y, x)

    return kernel


def layer_params(op, mag, sign, hist, H: int, fill: Sequence[float]):
    """Per-image LUT + scalar vector from the sampled (op, mag, sign) —
    mirrors the op-conditional logic of randaugment_layer in plain JAX."""
    B = op.shape[0]
    lut = RA._identity_lut(B)
    lut = jnp.where((op == 0)[:, None, None], RA._autocontrast_lut(hist), lut)
    lut = jnp.where((op == 1)[:, None, None], RA._equalize_lut(hist), lut)
    lut = jnp.where((op == 2)[:, None, None], RA._invert_lut(B), lut)
    lut = jnp.where((op == 4)[:, None, None], RA._posterize_lut(B, mag), lut)
    lut = jnp.where((op == 5)[:, None, None], RA._solarize_lut(B, mag), lut)
    lut = jnp.where((op == 6)[:, None, None], RA._solarize_add_lut(B, mag), lut)

    f = RA._enhance_factor(mag)
    a = jnp.where((op == 7) | (op == 8) | (op == 9), f, 1.0)
    b = jnp.where(op == 7, 1.0 - f, 0.0)
    c_mean = jnp.where(op == 8, 1.0 - f, 0.0)
    sharp_f = jnp.where(op == 10, f, 1.0)

    m = RA._affine_matrix(op, mag, sign, H)
    ma, mb, mc, md, me, mf = (m[:, i] for i in range(6))
    is_rot = (jnp.abs(mb) > 1e-12) & (jnp.abs(md) > 1e-12)
    sin_psi = md
    tan_half = sin_psi / (1.0 + jnp.maximum(ma, 1e-6))
    cy = (H - 1) / 2.0
    p1_slope = jnp.where(is_rot, -tan_half, mb)
    p1_center = jnp.where(is_rot, cy, 0.0)
    p1_offset = jnp.where(is_rot, 0.0, mc)
    p2_slope = jnp.where(is_rot, sin_psi, md)
    p2_center = jnp.where(is_rot, cy, 0.0)
    p2_offset = jnp.where(is_rot, 0.0, mf)
    p3_slope = jnp.where(is_rot, -tan_half, 0.0)
    return lut, (a, b, c_mean, sharp_f, p1_slope, p1_center, p1_offset,
                 p2_slope, p2_center, p2_offset, p3_slope)


def ra_layer_pallas(x: jax.Array, rng: jax.Array, magnitude_mean: float,
                    magnitude_std: float, fill: Sequence[float],
                    prob: float = 0.5, interpret: bool = False) -> jax.Array:
    """One RandAugment layer on (B,3,H,W) float images in [0,255]."""
    B, C, H, W = x.shape
    k_op, k_prob, k_mag, k_sign = jax.random.split(rng, 4)
    op = jax.random.randint(k_op, (B,), 0, RA.N_OPS)
    apply = jax.random.bernoulli(k_prob, prob, (B,))
    mag = jnp.clip(
        magnitude_mean + magnitude_std * jax.random.normal(k_mag, (B,)),
        0.0, RA.MAX_LEVEL,
    )
    sign = jax.random.bernoulli(k_sign, 0.5, (B,))

    x_int = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    hist = RA._histograms(x_int)
    lut, scal = layer_params(op, mag, sign, hist, H, fill)
    fill_v = jnp.asarray(fill, jnp.float32)
    scalars = jnp.stack(
        [*scal, apply.astype(jnp.float32),
         jnp.full((B,), fill_v[0]), jnp.full((B,), fill_v[1]),
         jnp.full((B,), fill_v[2]), jnp.zeros((B,))],
        axis=1,
    )  # (B, 16)

    # stage 1 in XLA (fast one-hot contraction; Mosaic reshape rules block
    # the in-kernel variant), stages 2-4 fused in the kernel; bf16 transfer
    # is exact (integer LUT values) and halves the HBM handoff
    y_lut = RA._apply_lut(lut, x_int, out_dtype=jnp.bfloat16)

    kernel = _make_kernel(H, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scalars (B,16) live whole in SMEM
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, H, W), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, H, W), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, y_lut, x.astype(jnp.bfloat16))
    return out
