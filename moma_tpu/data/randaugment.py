"""Device-side RandAugment — TPU-native re-design of the PIL pipeline
(dataset/RandAugment.py, timm variant: 15 ops, PosterizeTpu scaling,
prob=0.5/op, magnitude ~ N(m, mstd) clipped to [0,10], default
rand-n2-m10-mstd0.5; histo wiring dataset/histo_dataset.py:220-232).

Instead of materializing 15 per-op branch tensors (B*H*W*C*15 floats), a
layer decomposes into four fused stages of which exactly ONE is
non-identity for the sampled op:

  1. LUT stage      — AutoContrast, Equalize, Invert, PosterizeTpu,
                      Solarize, SolarizeAdd as a per-image (3,256) lookup
  2. color-matrix   — Color / Contrast / Brightness as out = M x + b
  3. sharpness blend— degenerate = PIL SMOOTH conv (border kept)
  4. affine warp    — Rotate / ShearX/Y / TranslateX/YRel via one bilinear
                      gather with per-image inverse matrix + fill color

Cost per layer: one 256-gather + one 3x3 matvec + one 3x3 depthwise conv
+ one bilinear gather — all fused by XLA into the surrounding step.
Deviation from PIL (documented): geometric resampling is always bilinear
(PIL picks randomly from {bilinear, bicubic}).

Ops are indexed as in the reference's _RAND_TRANSFORMS (RandAugment.py:312-329):
  0 AutoContrast, 1 Equalize, 2 Invert, 3 Rotate, 4 PosterizeTpu,
  5 Solarize, 6 SolarizeAdd, 7 Color, 8 Contrast, 9 Brightness,
  10 Sharpness, 11 ShearX, 12 ShearY, 13 TranslateXRel, 14 TranslateYRel
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

N_OPS = 15
MAX_LEVEL = 10.0
# PIL ITU-R 601-2 luma weights (convert('L'))
LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


# ---------------------------------------------------------------- LUT ops

def _identity_lut(B):
    return jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (B, 3, 256))


def _invert_lut(B):
    return jnp.broadcast_to(
        255.0 - jnp.arange(256, dtype=jnp.float32), (B, 3, 256)
    )


def _posterize_lut(B, magnitude):
    """PosterizeTpu: keep int(m/10*4) MSBs (RandAugment.py:215-218)."""
    bits_to_keep = jnp.floor(magnitude / MAX_LEVEL * 4).astype(jnp.int32)
    shift = 8 - bits_to_keep  # bits dropped
    v = jnp.arange(256, dtype=jnp.int32)
    lut = jnp.left_shift(jnp.right_shift(v[None, :], shift[:, None]),
                         shift[:, None])
    return jnp.broadcast_to(lut[:, None, :].astype(jnp.float32), (B, 3, 256))


def _solarize_lut(B, magnitude):
    thresh = jnp.floor(magnitude / MAX_LEVEL * 256)
    v = jnp.arange(256, dtype=jnp.float32)
    lut = jnp.where(v[None, :] < thresh[:, None], v[None, :], 255.0 - v[None, :])
    return jnp.broadcast_to(lut[:, None, :], (B, 3, 256))


def _solarize_add_lut(B, magnitude):
    add = jnp.floor(magnitude / MAX_LEVEL * 110)
    v = jnp.arange(256, dtype=jnp.float32)
    lut = jnp.where(v[None, :] < 128.0,
                    jnp.minimum(255.0, v[None, :] + add[:, None]), v[None, :])
    return jnp.broadcast_to(lut[:, None, :], (B, 3, 256))


def _histograms(x_int: jax.Array) -> jax.Array:
    """(B,H,W,3) int32 -> (B,3,256) counts, scatter-free.

    TPU scatters serialize; instead decompose each value v = 16*hi + lo
    and count via an MXU matmul of the two 16-wide one-hots:
        hist2d[b,c,hi,lo] = sum_n oh_hi[b,c,n,hi] * oh_lo[b,c,n,lo]
    One (16,N)x(N,16) contraction per image-channel; the 16-wide one-hots
    are fused into the matmul tiles by XLA (never materialized at full N).
    """
    B, H, W, C = x_int.shape
    flat = jnp.transpose(x_int, (0, 3, 1, 2)).reshape(B, C, H * W)
    hi = (flat // 16).astype(jnp.int32)
    lo = (flat % 16).astype(jnp.int32)
    bins = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[..., None] == bins).astype(jnp.bfloat16)  # (B,C,N,16)
    oh_lo = (lo[..., None] == bins).astype(jnp.bfloat16)
    hist2d = jnp.einsum(
        "bcnh,bcnl->bchl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    )
    return hist2d.reshape(B, C, 256)


def _autocontrast_lut(hist: jax.Array) -> jax.Array:
    """PIL ImageOps.autocontrast(cutoff=0): linear stretch per channel."""
    v = jnp.arange(256, dtype=jnp.float32)
    nonzero = hist > 0
    lo = jnp.argmax(nonzero, axis=-1).astype(jnp.float32)  # first nonzero
    hi = 255.0 - jnp.argmax(nonzero[..., ::-1], axis=-1).astype(jnp.float32)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-9)
    lut = (v[None, None, :] - lo[..., None]) * scale[..., None]
    lut = jnp.clip(lut, 0.0, 255.0)
    # hi <= lo -> identity (PIL returns image unchanged)
    return jnp.where((hi > lo)[..., None], lut, v[None, None, :])


def _equalize_lut(hist: jax.Array) -> jax.Array:
    """PIL ImageOps.equalize: step = (total - last_nonzero_count)//255;
    lut[i] = (cumsum[:i] + step//2) // step, clipped; identity if step==0."""
    v = jnp.arange(256, dtype=jnp.float32)
    nonzero = hist > 0
    # count of the highest occupied bin:
    last_idx = 255 - jnp.argmax(nonzero[..., ::-1], axis=-1)
    last_count = jnp.take_along_axis(hist, last_idx[..., None], axis=-1)[..., 0]
    total = jnp.sum(hist, axis=-1)
    step = jnp.floor((total - last_count) / 255.0)
    cum_before = jnp.cumsum(hist, axis=-1) - hist  # exclusive cumsum
    lut = jnp.floor(
        (cum_before + jnp.floor(step[..., None] / 2.0))
        / jnp.maximum(step[..., None], 1.0)
    )
    lut = jnp.clip(lut, 0.0, 255.0)
    return jnp.where((step > 0)[..., None], lut, v[None, None, :])


# -------------------------------------------------------------- the layer

def _enhance_factor(magnitude):
    """range [0.1, 1.9] (RandAugment.py:176-178)."""
    return magnitude / MAX_LEVEL * 1.8 + 0.1


def _signed(level, sign):
    return jnp.where(sign, level, -level)


def _affine_matrix(op, magnitude, sign, size: int):
    """Per-image inverse affine (a,b,c,d,e,f): src = A @ dst + t, matching
    PIL img.transform(AFFINE) / img.rotate semantics."""
    shear = _signed(magnitude / MAX_LEVEL * 0.3, sign)
    trans = _signed(magnitude / MAX_LEVEL * 0.45, sign) * size
    deg = _signed(magnitude / MAX_LEVEL * 30.0, sign)
    rad = -jnp.deg2rad(deg)  # PIL rotate is CCW; inverse map
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    c = (size - 1) / 2.0  # rotation center (PIL uses w/2; -1 for pixel grid)
    one = jnp.ones_like(magnitude)
    zero = jnp.zeros_like(magnitude)

    def mat(a, b, cc, d, e, f):
        return jnp.stack([a, b, cc, d, e, f], axis=-1)

    ident = mat(one, zero, zero, zero, one, zero)
    rot = mat(cos, sin, c - c * cos - c * sin, -sin, cos, c + c * sin - c * cos)
    shx = mat(one, shear, zero, zero, one, zero)
    shy = mat(one, zero, zero, shear, one, zero)
    tx = mat(one, zero, trans, zero, one, zero)
    ty = mat(one, zero, zero, zero, one, trans)

    m = ident
    m = jnp.where((op == 3)[:, None], rot, m)
    m = jnp.where((op == 11)[:, None], shx, m)
    m = jnp.where((op == 12)[:, None], shy, m)
    m = jnp.where((op == 13)[:, None], tx, m)
    m = jnp.where((op == 14)[:, None], ty, m)
    return m


def _affine_sample(x: jax.Array, m: jax.Array, fill: jax.Array) -> jax.Array:
    """Bilinear warp with out-of-bounds fill; x (B,H,W,C), m (B,6)."""
    B, H, W, C = x.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H,W)
    a, b, c0, d, e, f0 = (m[:, i] for i in range(6))
    src_x = a[:, None, None] * gx + b[:, None, None] * gy + c0[:, None, None]
    src_y = d[:, None, None] * gx + e[:, None, None] * gy + f0[:, None, None]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        bidx = jnp.arange(B)[:, None, None]
        vals = x[bidx, yi_c, xi_c]  # (B,H,W,C)
        return jnp.where(valid[..., None], vals, fill[None, None, None, :])

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _smooth(x: jax.Array) -> jax.Array:
    """PIL ImageFilter.SMOOTH: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13; PIL keeps
    the 1px border unfiltered.  Implemented as 8 shifted adds (pure VPU,
    NHWC-native) — a 1-channel conv would waste the lane dimension."""
    B, H, W, C = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = 5.0 * x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + p[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W, :]
    y = acc / 13.0
    border = jnp.zeros((H, W), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    return jnp.where(border[None, :, :, None], x, y)


def _apply_lut(lut: jax.Array, x_int: jax.Array) -> jax.Array:
    """Per-image LUT application WITHOUT a per-lane gather.

    A (B,3,256) table lookup lowered as gather costs ~770ms/batch at
    512^2x64 on v5e (per-lane dynamic indexing).  Decompose v = 16*hi + lo
    and contract two 16-wide one-hots against the LUT as a (16,16) matrix:
        out[n] = oh_hi[n,:] @ L @ oh_lo[n,:]
    lax.map over the batch keeps the (C,N,16) intermediate at ~25 MB.
    f32 matmuls keep fractional LUT entries (autocontrast) exact.
    """
    B, H, W, C = x_int.shape
    N = H * W
    L = lut.reshape(B, C, 16, 16)
    flat = jnp.transpose(x_int, (0, 3, 1, 2)).reshape(B, C, N)
    bins = jnp.arange(16, dtype=jnp.int32)

    def per_image(args):
        L_i, flat_i = args  # (C,16,16), (C,N)
        hi = flat_i // 16
        lo = flat_i % 16
        oh_hi = (hi[..., None] == bins).astype(jnp.float32)  # (C,N,16)
        t = jnp.einsum(
            "cnh,chl->cnl", oh_hi, L_i, preferred_element_type=jnp.float32
        )
        oh_lo = (lo[..., None] == bins).astype(jnp.float32)
        return jnp.sum(t * oh_lo, axis=-1)  # (C,N)

    out = jax.lax.map(per_image, (L, flat))  # (B,C,N)
    return jnp.transpose(out.reshape(B, C, H, W), (0, 2, 3, 1))


def randaugment_layer(x: jax.Array, rng: jax.Array, magnitude_mean: float,
                      magnitude_std: float, fill: Sequence[float],
                      prob: float = 0.5) -> jax.Array:
    """One RandAugment layer on float images in [0,255]; returns [0,255]."""
    B, H, W, C = x.shape
    k_op, k_prob, k_mag, k_sign = jax.random.split(rng, 4)
    op = jax.random.randint(k_op, (B,), 0, N_OPS)
    apply = jax.random.bernoulli(k_prob, prob, (B,))
    mag = magnitude_mean + magnitude_std * jax.random.normal(k_mag, (B,))
    mag = jnp.clip(mag, 0.0, MAX_LEVEL)
    sign = jax.random.bernoulli(k_sign, 0.5, (B,))
    fill_v = jnp.asarray(fill, jnp.float32)

    x_int = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    hist = _histograms(x_int)

    # ---- stage 1: LUT (only the LUT ops produce a non-identity table)
    lut = _identity_lut(B)
    lut = jnp.where((op == 0)[:, None, None], _autocontrast_lut(hist), lut)
    lut = jnp.where((op == 1)[:, None, None], _equalize_lut(hist), lut)
    lut = jnp.where((op == 2)[:, None, None], _invert_lut(B), lut)
    lut = jnp.where((op == 4)[:, None, None], _posterize_lut(B, mag), lut)
    lut = jnp.where((op == 5)[:, None, None], _solarize_lut(B, mag), lut)
    lut = jnp.where((op == 6)[:, None, None], _solarize_add_lut(B, mag), lut)
    y = _apply_lut(lut, x_int)

    # ---- stage 2: enhance blend as scalars: out = a*x + b*round(luma) + c
    # (Color 7: degenerate = grayscale; Contrast 8: degenerate = scalar
    # mean-of-gray; Brightness 9: degenerate = black — PIL ImageEnhance)
    f = _enhance_factor(mag)
    a = jnp.where((op == 7) | (op == 8) | (op == 9), f, 1.0)
    b = jnp.where(op == 7, 1.0 - f, 0.0)
    luma = jnp.floor(jnp.einsum("bhwc,c->bhw", y, LUMA) + 0.5)
    mean_l = jnp.floor(jnp.mean(luma, axis=(1, 2)) + 0.5)
    c_off = jnp.where(op == 8, (1.0 - f) * mean_l, 0.0)
    y = (
        a[:, None, None, None] * y
        + b[:, None, None, None] * luma[..., None]
        + c_off[:, None, None, None]
    )

    # ---- stage 3: sharpness blend (op 10)
    sharp_f = jnp.where(op == 10, f, 1.0)
    need_smooth = jnp.any(op == 10)
    smoothed = _smooth(y)
    y = smoothed + sharp_f[:, None, None, None] * (y - smoothed)

    # ---- stage 4: affine warp (ops 3, 11-14)
    m = _affine_matrix(op, mag, sign, H)
    y = _affine_sample(y, m, fill_v)

    y = jnp.clip(y, 0.0, 255.0)
    # prob gate: untouched image when the op is skipped
    return jnp.where(apply[:, None, None, None], y, x)


def rand_augment(
    images: jax.Array,
    rng: jax.Array,
    num_layers: int = 2,
    magnitude: float = 10.0,
    magnitude_std: float = 0.5,
    fill: Sequence[float] = (124.0, 116.0, 104.0),
) -> jax.Array:
    """rand-n{num_layers}-m{magnitude}-mstd{magnitude_std} on a uint8/float
    batch; returns float32 in [0,255].  PIL quantizes to uint8 between ops;
    we round between layers to match."""
    x = images.astype(jnp.float32)
    for i in range(num_layers):
        x = randaugment_layer(
            x, jax.random.fold_in(rng, i), magnitude, magnitude_std, fill
        )
        x = jnp.round(x)
    return x
