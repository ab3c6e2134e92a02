"""Pallas TPU kernel for one RandAugment layer (the augmentation hot path).

v1 measured on v5e at 512^2 x 128: the kernel itself ran at 2.6 ms/layer
but the layer still cost ~29 ms because stage 1 (histogram + 256-entry
LUT build/apply) stayed in XLA: a one-hot MXU histogram plus a 16-chunk
serialized LUT-apply loop, with ~9 ms of pure layout copies/reshapes
between batch-minor and row-major layouts (see scripts/conv_ceiling.py).

v2 moves ALL of stage 1 into the kernel, eliminating the XLA machinery:

  * invert / posterize / solarize / solarize-add are pure per-pixel
    arithmetic with op-conditional scalars (a 256-entry LUT in the XLA
    path only because PIL phrases them that way),
  * autocontrast needs just per-channel min/max (PIL cutoff=0) — two
    VMEM-resident reductions, then the same linear stretch,
  * equalize is the ONLY true table op: per-channel 256-bin histogram,
    prefix-sum ladder, and a 256-iteration select-apply loop, all inside
    the kernel.  This is the one expensive path (~0.29 ms/image) but it
    is PREDICATED: only images that drew op==Equalize AND passed the
    prob gate pay it (~1/30 of images).

  A per-pixel roll-ladder gather does NOT work for LUT application: the
  ladder is only a gather when the shift map is constant along the roll
  axis (mask at position c is consulted for values that originated at
  c+2^j — see _ladder_shift_2d), which holds for the shear warp but not
  for value-indexed lookups.  Hence the explicit 256-select loop for
  equalize, made affordable by rarity + predication.

Every other stage is predicated per image too (pl.when on SMEM
scalars): only ONE RandAugment op fires per layer per image (and only
with prob 0.5), so for most images enhance/smooth/warp are exact
identities (a=1,b=0,c=0 / sharp_f=1 / zero slopes+offsets) and the
27-stage warp roll ladder — the dominant kernel cost — runs only for
the ~27%% of images that drew an affine op and passed the gate.

Parity contract (vs data/randaugment.py, itself golden-tested against
PIL): identical math per stage; the kernel consumes integer-valued
images (decoded uint8 or the previous layer's rounded output — exact in
bf16) and applies the same clip(round(.)) quantization on entry to the
op pipeline and between layers.

Scalar layout per image (f32[24], SMEM):
  0 a_scale   1 b_luma    2 c_mean    3 sharp_f
  4 p1_slope  5 p1_center 6 p1_offset
  7 p2_slope  8 p2_center 9 p2_offset
  10 p3_slope 11 apply    12..14 fill RGB
  15 op_id    16 post_scale (2^bits_dropped)
  17 solar_th 18 sadd_add 19 hflip    20..23 (pad)

The hflip scalar folds the pipeline's RandomHorizontalFlip into layer 1
(histo_augment.py feeds the flip rng through rand_augment): XLA's
standalone `rev` pass costs ~2.6 ms at BS128@512^2 (a full HBM round
trip of the batch), while in-kernel the flip is an anti-diagonal matmul
on the MXU (Mosaic does not lower lane-axis `rev`) — exact for
integer-valued images, ~4 us/image, and predicated to flipped images.
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
    """Static circular LEFT roll via slice+concat (Mosaic-friendly):
    out[..., i, ...] = x[..., (i + shift) mod L, ...]."""
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


def _prefix_sum_lanes(row):
    """Inclusive prefix sum along the last (lane) axis via a log ladder."""
    ax = row.ndim - 1
    n = row.shape[ax]
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, ax)
    d = 1
    while d < n:
        shifted = _static_roll(row, n - d, axis=ax)  # out[i] = row[i-d]
        row = row + jnp.where(lane >= d, shifted, 0.0)
        d *= 2
    return row


def _equalize_image(img, H: int, W: int):
    """PIL ImageOps.equalize on an integer-valued (3,H,W) image, fully
    in-kernel (matches RA._equalize_lut + LUT apply bit-for-bit: same
    float formulas).  All three channels ride each 256-iteration loop
    together — one fused (3,H,W) compare + one (3,1,1) reduction per
    value instead of three scalar reduction trees.  Cost ~0.29 ms/image
    on v5e (0.55 before the 16x16 unroll) — predicated to the ~3%% of
    images that draw Equalize."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    iota_f = iota.astype(jnp.float32)

    # 16 outer steps x 16 inline values: Mosaic supports only unroll=1
    # or full unroll for in-kernel loops, and the 256-step loop's
    # per-iteration overhead dominates its tiny body — hand-unrolling
    # 16 values per step recovers the vector-unit pipelining.
    def hist_body(i, h3):  # h3 (3,1,256)
        v0 = i * 16
        for j in range(16):
            v = v0 + j
            v_f = v.astype(jnp.float32)
            m = jnp.where(img == v_f, 1.0, 0.0)
            # chained lane-then-sublane reduces (no cross-plane reduce)
            cnt = jnp.sum(jnp.sum(m, axis=2, keepdims=True),
                          axis=1, keepdims=True)  # (3,1,1)
            h3 = h3 + cnt * jnp.where(iota == v, 1.0, 0.0)
        return h3

    hist = jax.lax.fori_loop(
        0, 16, hist_body, jnp.zeros((3, 1, 256), jnp.float32))
    nonzero = hist > 0.0
    last_idx = jnp.max(jnp.where(nonzero, iota_f, -1.0),
                       axis=2, keepdims=True)  # (3,1,1)
    last_count = jnp.sum(jnp.where(iota_f == last_idx, hist, 0.0),
                         axis=2, keepdims=True)
    step = jnp.floor((float(H * W) - last_count) / 255.0)  # (3,1,1)
    cum_before = _prefix_sum_lanes(hist) - hist  # exclusive cumsum
    lut = jnp.floor(
        (cum_before + jnp.floor(step / 2.0)) / jnp.maximum(step, 1.0)
    )
    lut = jnp.clip(lut, 0.0, 255.0)
    lut = jnp.where(step > 0.0, lut, iota_f)  # step==0 -> identity

    def apply_body(i, acc):  # acc (3,H,W); same 16x16 unroll as hist
        v0 = i * 16
        for j in range(16):
            v = v0 + j
            lv = jnp.sum(jnp.where(iota == v, lut, 0.0),
                         axis=2, keepdims=True)  # (3,1,1) = lut[:,v]
            acc = jnp.where(img == v.astype(jnp.float32), lv, acc)
        return acc

    return jax.lax.fori_loop(0, 16, apply_body, img)


def _hflip_w(y, W: int):
    """Horizontal flip of (3,H,W) via an anti-diagonal (exchange-matrix)
    matmul — Mosaic does not lower lane-axis `rev`, but the MXU reverses
    lanes for free.  Exact for integer-valued images: each output pixel
    is a single 1.0*value product accumulated in f32."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    exch = (i0 + i1 == W - 1).astype(jnp.bfloat16)
    planes = [
        jax.lax.dot(y[ch].astype(jnp.bfloat16), exch,
                    preferred_element_type=jnp.float32)[None]
        for ch in range(3)
    ]
    return jnp.concatenate(planes, axis=0)


def _make_kernel(H: int, W: int):
    def kernel(scal_all_ref, x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        def sc(j):
            return scal_all_ref[i, j]

        gate = sc(11) > 0.5
        flip = sc(19) > 0.5

        @pl.when(jnp.logical_not(gate) & jnp.logical_not(flip))
        def _skip():
            # untouched image when the op is skipped (prob gate)
            o_ref[0] = x_ref[0].astype(o_ref.dtype)

        @pl.when(jnp.logical_not(gate) & flip)
        def _skip_flipped():
            o_ref[0] = _hflip_w(
                x_ref[0].astype(jnp.float32), W
            ).astype(o_ref.dtype)

        @pl.when(gate)
        def _apply():
            # entry quantization: PIL works on uint8 (x_int in the XLA
            # path); identical for integer-valued inputs
            acc_ref[...] = jnp.clip(
                jnp.round(x_ref[0].astype(jnp.float32)), 0.0, 255.0
            )

            @pl.when(flip)
            def _flip():
                acc_ref[...] = _hflip_w(acc_ref[...], W)

            op = sc(15)

            # ---- stage 1: the LUT ops, as per-pixel arithmetic
            @pl.when(op == 2.0)
            def _invert():
                acc_ref[...] = 255.0 - acc_ref[...]

            @pl.when(op == 4.0)
            def _posterize():
                ps = sc(16)  # 2^bits_dropped
                acc_ref[...] = jnp.floor(acc_ref[...] / ps) * ps

            @pl.when(op == 5.0)
            def _solarize():
                y = acc_ref[...]
                acc_ref[...] = jnp.where(y < sc(17), y, 255.0 - y)

            @pl.when(op == 6.0)
            def _solarize_add():
                y = acc_ref[...]
                acc_ref[...] = jnp.where(
                    y < 128.0, jnp.minimum(255.0, y + sc(18)), y
                )

            @pl.when(op == 0.0)
            def _autocontrast():
                # PIL cutoff=0: per-channel linear stretch from min/max
                y = acc_ref[...]
                planes = []
                for ch in range(3):
                    p = y[ch]
                    lo = jnp.min(p)
                    hi = jnp.max(p)
                    scale = 255.0 / jnp.maximum(hi - lo, 1e-9)
                    st = jnp.floor(jnp.clip((p - lo) * scale, 0.0, 255.0))
                    planes.append(jnp.where(hi > lo, st, p)[None])
                acc_ref[...] = jnp.concatenate(planes, axis=0)

            @pl.when(op == 1.0)
            def _equalize():
                acc_ref[...] = _equalize_image(acc_ref[...], H, W)

            a = sc(0)
            b = sc(1)
            c_mean = sc(2)
            enh_active = (a != 1.0) | (b != 0.0) | (c_mean != 0.0)

            @pl.when(enh_active)
            def _enhance():
                # stage 2: out = a*y + b*round(luma) + c*mean_l
                y = acc_ref[...]
                luma = jnp.floor(
                    LUMA_R * y[0] + LUMA_G * y[1] + LUMA_B * y[2] + 0.5
                )
                mean_l = jnp.floor(jnp.sum(luma) / (H * W) + 0.5)
                acc_ref[...] = a * y + b * luma[None, :, :] + (c_mean * mean_l)

            @pl.when(sc(3) != 1.0)
            def _sharp():
                # stage 3: sharpness blend (PIL SMOOTH, border kept)
                y = acc_ref[...]
                sharp_f = sc(3)
                p = jnp.pad(y, ((0, 0), (1, 1), (1, 1)))
                acc = 5.0 * y
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dy == 0 and dx == 0:
                            continue
                        acc = acc + p[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
                sm = acc / 13.0
                row_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                col_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
                border = (
                    (row_i == 0) | (row_i == H - 1)
                    | (col_i == 0) | (col_i == W - 1)
                )[None, :, :]
                sm = jnp.where(border, y, sm)
                acc_ref[...] = sm + sharp_f * (y - sm)

            # stage 4: up-to-3-pass shear warp; a pass with zero slope AND
            # zero offset maps src=dst with frac=0 -> exact identity, skip
            def warp_pass(slope, center, offset, axis):
                @pl.when((slope != 0.0) | (offset != 0.0))
                def _pass():
                    z = jnp.zeros((1, H, W), jnp.float32)
                    fill_b = jnp.concatenate(
                        [z + sc(12), z + sc(13), z + sc(14)], axis=0
                    )
                    acc_ref[...] = _resample_pass(
                        acc_ref[...], slope, center, offset, axis, fill_b
                    )

            cy = (H - 1) / 2.0
            warp_pass(sc(4), sc(5), sc(6), 2)
            warp_pass(sc(7), sc(8), sc(9), 1)
            warp_pass(sc(10), cy, 0.0, 2)

            # clip + inter-layer PIL rounding
            o_ref[0] = jnp.round(
                jnp.clip(acc_ref[...], 0.0, 255.0)
            ).astype(o_ref.dtype)

    return kernel


def layer_scalars(op, mag, sign, apply, H: int, fill: Sequence[float],
                  W: int | None = None, hflip=None):
    """(B,24) per-image scalar vector from the sampled (op, mag, sign) —
    mirrors the op-conditional logic of randaugment_layer in plain JAX.
    All full-image work happens in the kernel; this is O(B) math."""
    B = op.shape[0]
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
    cx = cy if W is None else (W - 1) / 2.0
    p1_slope = jnp.where(is_rot, -tan_half, mb)
    p1_center = jnp.where(is_rot, cy, 0.0)
    p1_offset = jnp.where(is_rot, 0.0, mc)
    # pass 2 shifts along columns -> its rotation center is cx, not cy
    # (identical for the square images every pipeline feeds; matches the
    # XLA path randaugment.py p2_center=cx for non-square inputs)
    p2_slope = jnp.where(is_rot, sin_psi, md)
    p2_center = jnp.where(is_rot, cx, 0.0)
    p2_offset = jnp.where(is_rot, 0.0, mf)
    p3_slope = jnp.where(is_rot, -tan_half, 0.0)

    # LUT-op parameters (RA._posterize_lut / _solarize_lut / _solarize_add_lut)
    bits_to_keep = jnp.floor(mag / RA.MAX_LEVEL * 4)
    post_scale = jnp.exp2(8.0 - bits_to_keep)  # 2^bits_dropped, exact
    solar_th = jnp.floor(mag / RA.MAX_LEVEL * 256)
    sadd_add = jnp.floor(mag / RA.MAX_LEVEL * 110)

    fill_v = jnp.asarray(fill, jnp.float32)
    cols = [a, b, c_mean, sharp_f,
            p1_slope, p1_center, p1_offset,
            p2_slope, p2_center, p2_offset, p3_slope,
            apply.astype(jnp.float32),
            jnp.full((B,), fill_v[0]), jnp.full((B,), fill_v[1]),
            jnp.full((B,), fill_v[2]),
            op.astype(jnp.float32), post_scale, solar_th, sadd_add,
            (jnp.zeros((B,)) if hflip is None
             else hflip.astype(jnp.float32))]
    cols += [jnp.zeros((B,))] * (24 - len(cols))
    return jnp.stack(cols, axis=1)  # (B, 24)


def ra_layer_from_draws(x: jax.Array, op: jax.Array, mag: jax.Array,
                        sign: jax.Array, apply: jax.Array,
                        fill: Sequence[float], interpret: bool = False,
                        out_dtype=jnp.float32, hflip=None) -> jax.Array:
    """Kernel entry with the per-image (op, mag, sign, apply) draws
    supplied by the caller — used by ra_layer_pallas and by the per-op
    forced-coverage tests.  hflip: optional (B,) bool — flip the image
    before the op (the fused RandomHorizontalFlip stage)."""
    B, C, H, W = x.shape
    scalars = layer_scalars(op, mag, sign, apply, H, fill, W=W, hflip=hflip)

    kernel = _make_kernel(H, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scalars (B,24) live whole in SMEM
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, H, W), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, H, W), jnp.float32)],
    )
    # donate x into the output when dtypes match: each grid step reads its
    # image block before writing the block back, and the caller never
    # reuses x — saves XLA's carry-preservation copy (~1.2 ms at BS128)
    alias = {1: 0} if x.dtype == out_dtype else {}
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        input_output_aliases=alias,
        interpret=interpret,
    )(scalars, x)
    return out


def ra_layer_pallas(x: jax.Array, rng: jax.Array, magnitude_mean: float,
                    magnitude_std: float, fill: Sequence[float],
                    prob: float = 0.5, interpret: bool = False,
                    out_dtype=jnp.float32, hflip=None,
                    op=None) -> jax.Array:
    """One RandAugment layer on (B,3,H,W) integer-valued images in
    [0,255] (any float dtype; bf16 in/out is exact for integers and
    halves HBM traffic when chaining layers).  hflip: optional (B,) bool
    horizontal-flip bits applied before the layer's op.  op: optional
    externally-drawn (B,) op indices (the weighted without-replacement
    path, data/randaugment.draw_ops_weighted)."""
    B, C, H, W = x.shape
    k_op, k_prob, k_mag, k_sign = jax.random.split(rng, 4)
    if op is None:
        op = RA._draw_ops(k_op, B)
    apply = jax.random.bernoulli(k_prob, prob, (B,))
    mag = jnp.clip(
        magnitude_mean + magnitude_std * jax.random.normal(k_mag, (B,)),
        0.0, RA.MAX_LEVEL,
    )
    sign = jax.random.bernoulli(k_sign, 0.5, (B,))
    return ra_layer_from_draws(x, op, mag, sign, apply, fill,
                               interpret=interpret, out_dtype=out_dtype,
                               hflip=hflip)
