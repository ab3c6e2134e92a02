"""Device-side RandAugment — TPU-native re-design of the PIL pipeline
(dataset/RandAugment.py, timm variant: 15 ops, PosterizeTpu scaling,
prob=0.5/op, magnitude ~ N(m, mstd) clipped to [0,10], default
rand-n2-m10-mstd0.5; histo wiring dataset/histo_dataset.py:220-232).

Design notes (all measured on v5e at 512^2 x 64):
  * One layer decomposes into four fused stages of which exactly ONE is
    non-identity for the sampled op: LUT -> enhance-blend -> sharpness ->
    affine warp.  Branch-per-op would materialize 15 full-image tensors.
  * NO per-element gathers/scatters anywhere: TPU serializes them
    (table-LUT gather: 770 ms; 2-D warp gather: 1.5 s; take_along_axis:
    similar).  Instead:
      - histograms  = 16x16 one-hot MXU contraction        (370 -> 12 ms)
      - LUT apply   = one-hot x (16,16)-matrix contraction  (770 -> ~5 ms)
      - affine warp = Paeth 3-shear decomposition, each pass a binary
        ladder of STATIC rolls + selects                   (1.5 s -> ~30 ms)
  * Internals run in (B, C, H, W): with NHWC the C=3 channel axis sits on
    the 128-wide lane dimension (2.3% utilization); channels-first puts
    (H, W) on (sublanes, lanes) at full width.  Convert once per call.

Ops are indexed as in the reference's _RAND_TRANSFORMS (RandAugment.py:312-329):
  0 AutoContrast, 1 Equalize, 2 Invert, 3 Rotate, 4 PosterizeTpu,
  5 Solarize, 6 SolarizeAdd, 7 Color, 8 Contrast, 9 Brightness,
  10 Sharpness, 11 ShearX, 12 ShearY, 13 TranslateXRel, 14 TranslateYRel

Deviation from PIL (documented): geometric resampling is separable
3-pass bilinear (PIL: one-shot, random bilinear/bicubic choice).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

N_OPS = 15
MAX_LEVEL = 10.0
# index-aligned with the dispatch below and the reference's
# _RAND_TRANSFORMS (dataset/RandAugment.py:312-329)
OP_NAMES = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeTpu",
    "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
    "Sharpness", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
)
# op id N_OPS (15) is a dispatch no-op: every `op == k` comparison in the
# XLA stages falls through (identity LUT, a=1/b=0/c=0 enhance, sharp_f=1,
# identity affine) and the Pallas kernel's scalar vector degenerates the
# same way, so the rounded-integer image passes through exactly — this is
# the CMC table's explicit 'Identity' op (dataset/RandAugment.py:333).
IDENTITY_OP = N_OPS
# The reference's color-op-free table for CMC-split inputs
# (dataset/RandAugment.py:331-341, rand_augment_ops_cmc at :383-389).
# Unreachable upstream (no caller passes use_cmc=True); ported as an
# op-table preset selected by rand_augment(use_cmc=True).
CMC_OP_NAMES = ("AutoContrast", "Identity", "Rotate", "Sharpness",
                "ShearX", "ShearY", "TranslateXRel", "TranslateYRel")
CMC_OP_IDS = tuple(
    IDENTITY_OP if n == "Identity" else OP_NAMES.index(n)
    for n in CMC_OP_NAMES)
# the reference's experimental op-choice weight set 0
# (dataset/RandAugment.py:346-363; selected by the 'w0' config section)
_RAND_CHOICE_WEIGHTS_0 = {
    "Rotate": 0.3, "ShearX": 0.2, "ShearY": 0.2,
    "TranslateXRel": 0.1, "TranslateYRel": 0.1,
    "Color": 0.025, "Sharpness": 0.025, "AutoContrast": 0.025,
    "Solarize": 0.005, "SolarizeAdd": 0.005, "Contrast": 0.005,
    "Brightness": 0.005, "Equalize": 0.005,
    "PosterizeTpu": 0.0, "Invert": 0.0,
}


def select_rand_weights(weight_idx: int = 0):
    """Normalized op-choice probabilities aligned to OP_NAMES — the
    reference's _select_rand_weights (RandAugment.py:365-371; only set 0
    exists there too)."""
    if weight_idx != 0:
        raise ValueError(f"only weight set 0 exists (got w{weight_idx})")
    w = [float(_RAND_CHOICE_WEIGHTS_0[k]) for k in OP_NAMES]
    s = sum(w)
    return tuple(v / s for v in w)


def parse_ra_config(config_str: str):
    """'rand-n2-m10-mstd0.5[-w0]' -> (num_layers, magnitude,
    magnitude_std, choice_weights|None) — the reference's config-string
    grammar (rand_augment_transform, dataset/RandAugment.py:405-448):
    dash-separated sections, first must be 'rand'; keys m (int magnitude),
    n (int layers), mstd (float), w (weight-set index); unknown keys
    rejected; keyless sections skipped (the reference `continue`s them)."""
    import re

    magnitude = MAX_LEVEL
    num_layers = 2
    # when the string omits mstd the reference adds NO magnitude noise
    # (AutoAugmentOp: hparams.get('magnitude_std', 0), RandAugment.py:299)
    magnitude_std = 0.0
    weights = None
    parts = config_str.split("-")
    if not parts or parts[0] != "rand":
        raise ValueError(
            f"RandAugment config must start with 'rand': {config_str!r}")
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            magnitude_std = float(val)
        elif key == "m":
            magnitude = float(int(val))
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            weights = select_rand_weights(int(val))
        else:
            raise ValueError(
                f"unknown RandAugment config section {c!r} in {config_str!r}")
    return num_layers, magnitude, magnitude_std, weights


def _draw_ops(k_op, B: int):
    """Per-image uniform op indices — the unweighted path draws WITH
    replacement across layers, like the reference's np.random.choice with
    replace=True (RandAugment.py:397-398).  Weighted draws go through
    draw_ops_weighted (one without-replacement draw per image)."""
    return jax.random.randint(k_op, (B,), 0, N_OPS)


def draw_ops_weighted(rng, B: int, num_layers: int, choice_weights):
    """(B, num_layers) weighted op draw WITHOUT replacement — the
    reference draws all of an image's layer ops in ONE
    np.random.choice(..., replace=choice_weights is None, p=...) call
    ('no replacement when using weighted choice', RandAugment.py:396-398),
    so under 'w0' an image never gets the same op twice.

    Gumbel-top-k: the num_layers largest of log(p_i) + Gumbel_i are an
    exact sample without replacement from the categorical; zero-weight
    ops (log p = -inf) can never surface."""
    import numpy as _np

    nonzero = int((_np.asarray(choice_weights) > 0).sum())
    if num_layers > nonzero:
        raise ValueError(
            f"num_layers={num_layers} > {nonzero} ops with nonzero weight: "
            "cannot sample without replacement")
    logp = jnp.log(jnp.asarray(choice_weights, jnp.float32))
    u = jax.random.uniform(rng, (B, N_OPS), minval=1e-20, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    _, idx = jax.lax.top_k(logp[None, :] + gumbel, num_layers)
    return idx
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
    """(B,C,H,W) int32 -> (B,C,256) counts, scatter-free.

    TPU scatters serialize; decompose each value v = 16*hi + lo and count
    via an MXU matmul of the two 16-wide one-hots:
        hist2d[b,c,hi,lo] = sum_n oh_hi[b,c,n,hi] * oh_lo[b,c,n,lo]
    """
    B, C, H, W = x_int.shape
    flat = x_int.reshape(B, C, H * W)
    hi = flat // 16
    lo = flat % 16
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
    # PIL truncates each entry to int (ImageOps.autocontrast `ix = int(..)`);
    # floor after the >=0 clip == that truncation.  Also makes every LUT
    # integer-valued -> exact in bf16 (see _apply_lut).
    lut = jnp.floor(jnp.clip((v[None, None, :] - lo[..., None]) * scale[..., None],
                             0.0, 255.0))
    # hi <= lo -> identity (PIL returns image unchanged)
    return jnp.where((hi > lo)[..., None], lut, v[None, None, :])


def _equalize_lut(hist: jax.Array) -> jax.Array:
    """PIL ImageOps.equalize: step = (total - last_nonzero_count)//255;
    lut[i] = (cumsum[:i] + step//2) // step, clipped; identity if step==0."""
    v = jnp.arange(256, dtype=jnp.float32)
    nonzero = hist > 0
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


def _apply_lut(lut: jax.Array, x_int: jax.Array,
               out_dtype=jnp.float32) -> jax.Array:
    """Per-image LUT application WITHOUT a per-lane gather (x_int NCHW).

    Decompose v = 16*hi + lo and contract two 16-wide one-hots against the
    LUT as a (16,16) matrix: out[n] = oh_hi[n,:] @ L @ oh_lo[n,:].
    Batch processed in chunks to bound the (chunk,C,N,16) intermediate.

    Runs in bf16 end-to-end and stays EXACT: all LUT builders emit integer
    values 0..255 (exactly representable in bf16), one-hots are 0/1, and
    each reduction has a single nonzero term — so bf16 halves the HBM
    traffic of the (chunk,C,N,16) intermediates for free (this stage is
    bandwidth-bound, ~22 ms/step at BS128@512^2 in f32).
    """
    B, C, H, W = x_int.shape
    N = H * W
    L = lut.reshape(B, C, 16, 16).astype(jnp.bfloat16)
    flat = x_int.reshape(B, C, N)
    bins = jnp.arange(16, dtype=jnp.int32)

    def per_chunk(args):
        L_i, flat_i = args  # (chunk,C,16,16), (chunk,C,N)
        hi = flat_i // 16
        lo = flat_i % 16
        oh_hi = (hi[..., None] == bins).astype(jnp.bfloat16)
        t = jnp.einsum(
            "bcnh,bchl->bcnl", oh_hi, L_i,
            preferred_element_type=jnp.bfloat16,
        )
        oh_lo = (lo[..., None] == bins).astype(jnp.bfloat16)
        return jnp.sum(t * oh_lo, axis=-1, dtype=jnp.bfloat16)

    chunk = max(1, min(B, 8))
    if B % chunk:
        chunk = 1
    Lc = L.reshape(B // chunk, chunk, C, 16, 16)
    fc = flat.reshape(B // chunk, chunk, C, N)
    out = jax.lax.map(per_chunk, (Lc, fc)).reshape(B, C, N)
    return out.reshape(B, C, H, W).astype(out_dtype)


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


def _roll_shift(x: jax.Array, k: jax.Array, axis: int) -> jax.Array:
    """out[..., i, ...] = x[..., (i + k) mod L, ...] with per-(b,row)
    integer k — GATHER-FREE binary ladder of static rolls (x NCHW).

    k: (B, R) where R indexes the orthogonal spatial axis (rows of H when
    axis==3, columns of W when axis==2).
    """
    L = x.shape[axis]
    s = jnp.mod(k, L)
    if axis == 3:  # shifting along W; k indexed by H row
        gate = lambda u: u[:, None, :, None]
    else:  # axis == 2: shifting along H; k indexed by W column
        gate = lambda u: u[:, None, None, :]
    y = x
    bit = 1
    n_stages = max(1, int(math.ceil(math.log2(L))))
    for j in range(n_stages):
        use = ((s >> j) & 1) == 1
        rolled = jnp.roll(y, -bit, axis=axis)
        y = jnp.where(gate(use), rolled, y)
        bit *= 2
    return y


def _resample_x(x: jax.Array, shift: jax.Array, fill: jax.Array) -> jax.Array:
    """out[b,c,y,i] = lerp x[b,c,y,i+shift[b,y]], OOB -> fill (NCHW)."""
    B, C, H, W = x.shape
    k = jnp.floor(shift)
    frac = (shift - k)[:, None, :, None]
    y0 = _roll_shift(x, k.astype(jnp.int32), axis=3)
    y1 = jnp.roll(y0, -1, axis=3)
    src0 = jnp.arange(W, dtype=jnp.float32)[None, None, :] + k[:, :, None]  # (B,H,W)
    v0 = ((src0 >= 0) & (src0 <= W - 1))[:, None, :, :]
    v1 = ((src0 + 1 >= 0) & (src0 + 1 <= W - 1))[:, None, :, :]
    fill_b = fill[None, :, None, None]
    return (
        jnp.where(v0, y0, fill_b) * (1 - frac)
        + jnp.where(v1, y1, fill_b) * frac
    )


def _resample_y(x: jax.Array, shift: jax.Array, fill: jax.Array) -> jax.Array:
    """out[b,c,j,x] = lerp x[b,c,j+shift[b,x],x]; shift (B,W) (NCHW)."""
    B, C, H, W = x.shape
    k = jnp.floor(shift)
    frac = (shift - k)[:, None, None, :]
    y0 = _roll_shift(x, k.astype(jnp.int32), axis=2)
    y1 = jnp.roll(y0, -1, axis=2)
    src0 = jnp.arange(H, dtype=jnp.float32)[None, :, None] + k[:, None, :]  # (B,H,W)
    v0 = ((src0 >= 0) & (src0 <= H - 1))[:, None, :, :]
    v1 = ((src0 + 1 >= 0) & (src0 + 1 <= H - 1))[:, None, :, :]
    fill_b = fill[None, :, None, None]
    return (
        jnp.where(v0, y0, fill_b) * (1 - frac)
        + jnp.where(v1, y1, fill_b) * frac
    )


def _affine_sample(x: jax.Array, m: jax.Array, fill: jax.Array) -> jax.Array:
    """Bilinear warp for the RandAugment geometric ops via a 3-pass shear
    decomposition (Paeth; x NCHW): R(psi) = Xshear(-tan(psi/2)) *
    Yshear(sin psi) * Xshear(-tan(psi/2)); pure shears/translates use one
    pass (others identity).

    Extracts per-op parameters from the (B,6) inverse matrices:
      rotate:  [[a,b],[d,e]] = [[cos,-sin],[sin,cos]](psi) -> sin psi = d
      shearX:  b = s;  shearY: d = s;  transX: c0 = t;  transY: f0 = t
    """
    B, C, H, W = x.shape
    a, b, c0, d, e, f0 = (m[:, i] for i in range(6))
    is_rot = (jnp.abs(b) > 1e-12) & (jnp.abs(d) > 1e-12)
    sin_psi = d
    tan_half = sin_psi / (1.0 + jnp.maximum(a, 1e-6))
    cy = (H - 1) / 2.0
    cx = (W - 1) / 2.0
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)

    # pass 1 (X): rotate -> -tan_half centered; shearX -> b*y; transX -> c0
    shear_x_slope = jnp.where(is_rot, 0.0, b)
    p1_slope = jnp.where(is_rot, -tan_half, shear_x_slope)
    p1_center = jnp.where(is_rot, cy, 0.0)
    p1_offset = jnp.where(is_rot, 0.0, c0)
    shift1 = p1_slope[:, None] * (rows[None, :] - p1_center[:, None]) + p1_offset[:, None]
    y1 = _resample_x(x, shift1, fill)

    # pass 2 (Y): rotate -> +sin centered; shearY -> d*x; transY -> f0
    p2_slope = jnp.where(is_rot, sin_psi, d)
    p2_center = jnp.where(is_rot, cx, 0.0)
    p2_offset = jnp.where(is_rot, 0.0, f0)
    shift2 = p2_slope[:, None] * (cols[None, :] - p2_center[:, None]) + p2_offset[:, None]
    y2 = _resample_y(y1, shift2, fill)

    # pass 3 (X): rotate only
    p3_slope = jnp.where(is_rot, -tan_half, 0.0)
    shift3 = p3_slope[:, None] * (rows[None, :] - cy)
    return _resample_x(y2, shift3, fill)


def _smooth(x: jax.Array) -> jax.Array:
    """PIL ImageFilter.SMOOTH: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13 as shifted
    adds (pure VPU); PIL keeps the 1px border unfiltered.  x NCHW."""
    B, C, H, W = x.shape
    p = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = 5.0 * x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + p[:, :, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
    y = acc / 13.0
    border = jnp.zeros((H, W), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    return jnp.where(border[None, None, :, :], x, y)


def randaugment_layer(x: jax.Array, rng: jax.Array, magnitude_mean: float,
                      magnitude_std: float, fill: Sequence[float],
                      prob: float = 0.5, op: jax.Array | None = None) -> jax.Array:
    """One RandAugment layer on float NCHW images in [0,255].  `op`:
    optional externally-drawn (B,) op indices (the weighted
    without-replacement path); prob/magnitude/sign still draw here."""
    B, C, H, W = x.shape
    k_op, k_prob, k_mag, k_sign = jax.random.split(rng, 4)
    if op is None:
        op = _draw_ops(k_op, B)
    apply = jax.random.bernoulli(k_prob, prob, (B,))
    mag = magnitude_mean + magnitude_std * jax.random.normal(k_mag, (B,))
    mag = jnp.clip(mag, 0.0, MAX_LEVEL)
    sign = jax.random.bernoulli(k_sign, 0.5, (B,))
    fill_v = jnp.asarray(fill, jnp.float32)

    x_int = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)
    x_int = jax.lax.optimization_barrier(x_int)
    hist = jax.lax.optimization_barrier(_histograms(x_int))

    # ---- stage 1: LUT (only the LUT ops produce a non-identity table)
    lut = _identity_lut(B)
    lut = jnp.where((op == 0)[:, None, None], _autocontrast_lut(hist), lut)
    lut = jnp.where((op == 1)[:, None, None], _equalize_lut(hist), lut)
    lut = jnp.where((op == 2)[:, None, None], _invert_lut(B), lut)
    lut = jnp.where((op == 4)[:, None, None], _posterize_lut(B, mag), lut)
    lut = jnp.where((op == 5)[:, None, None], _solarize_lut(B, mag), lut)
    lut = jnp.where((op == 6)[:, None, None], _solarize_add_lut(B, mag), lut)
    y = jax.lax.optimization_barrier(_apply_lut(lut, x_int))

    # ---- stage 2: enhance blend as scalars: out = a*x + b*round(luma) + c
    # (Color 7: degenerate = grayscale; Contrast 8: degenerate = scalar
    # mean-of-gray; Brightness 9: degenerate = black — PIL ImageEnhance)
    f = _enhance_factor(mag)
    a = jnp.where((op == 7) | (op == 8) | (op == 9), f, 1.0)
    b = jnp.where(op == 7, 1.0 - f, 0.0)
    luma = jnp.floor(jnp.einsum("bchw,c->bhw", y, LUMA) + 0.5)
    mean_l = jnp.floor(jnp.mean(luma, axis=(1, 2)) + 0.5)
    c_off = jnp.where(op == 8, (1.0 - f) * mean_l, 0.0)
    y = (
        a[:, None, None, None] * y
        + b[:, None, None, None] * luma[:, None, :, :]
        + c_off[:, None, None, None]
    )

    # ---- stage 3: sharpness blend (op 10)
    sharp_f = jnp.where(op == 10, f, 1.0)
    smoothed = _smooth(y)
    y = smoothed + sharp_f[:, None, None, None] * (y - smoothed)
    y = jax.lax.optimization_barrier(y)

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
    use_pallas: bool | None = None,
    hflip_rng: jax.Array | None = None,
    choice_weights: Sequence[float] | None = None,
    use_cmc: bool = False,
) -> jax.Array:
    """rand-n{num_layers}-m{magnitude}-mstd{magnitude_std} on a uint8/float
    NHWC batch; returns float32 NHWC in [0,255].  PIL quantizes to uint8
    between ops; we round between layers to match.  Internals run NCHW
    (see module docstring).

    use_pallas: route each layer through the fused VMEM-resident Pallas
    kernel (ops/pallas_randaugment.py) — default on TPU.

    hflip_rng: fold the pipeline's preceding RandomHorizontalFlip(p=0.5)
    into this stage (same bernoulli draw as augment.random_hflip with
    this key).  On the Pallas path the flip rides layer 1's kernel (an
    in-kernel MXU anti-diagonal matmul) instead of a standalone XLA
    `rev` pass over the whole batch (~2.6 ms at BS128@512^2); flip
    commutes with the entry rounding, so semantics are identical.
    """
    x = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))
    # PIL feeds RandAugment uint8 (RRC quantizes before it); fractional
    # inputs (our device-side bilinear RRC) are quantized HERE in f32 —
    # a bf16 cast first would double-round (101.49 -> 101.5 -> 102)
    x = jnp.round(x)
    hflip = None
    if hflip_rng is not None:
        hflip = jax.random.bernoulli(hflip_rng, 0.5, (x.shape[0],))
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform != "cpu"
    # weighted choice ('w' config): the reference draws ALL of an image's
    # layer ops in one without-replacement np.random.choice (RandAugment.
    # py:396-398) — draw the (B, num_layers) matrix up front and feed one
    # column per layer.  fold_in(rng, num_layers) cannot collide with the
    # per-layer fold_in(rng, i), i < num_layers.
    ops_bk = None
    if use_cmc and num_layers > 0:
        if choice_weights is not None:
            # upstream this combination crashes: _select_rand_weights
            # builds probs over the FULL 15-op table while the cmc op
            # list has 8 entries (np.random.choice length mismatch,
            # RandAugment.py:365-371 vs :383-389) — reject it loudly
            raise ValueError("use_cmc cannot combine with 'w' choice "
                             "weights (broken upstream too)")
        idx = jax.random.randint(
            jax.random.fold_in(rng, num_layers),
            (x.shape[0], num_layers), 0, len(CMC_OP_IDS))
        ops_bk = jnp.asarray(CMC_OP_IDS, jnp.int32)[idx]
    elif choice_weights is not None and num_layers > 0:
        ops_bk = draw_ops_weighted(
            jax.random.fold_in(rng, num_layers), x.shape[0], num_layers,
            choice_weights,
        )
    if use_pallas and num_layers > 0:
        from moma_tpu.ops.pallas_randaugment import ra_layer_pallas

        # bf16 carry between layers: every inter-layer image is rounded
        # integers 0..255 (exact in bf16), halving the kernel HBM traffic
        x = x.astype(jnp.bfloat16)
        for i in range(num_layers):
            x = ra_layer_pallas(
                x, jax.random.fold_in(rng, i), magnitude, magnitude_std,
                fill, out_dtype=jnp.bfloat16,
                hflip=hflip if i == 0 else None,
                op=None if ops_bk is None else ops_bk[:, i],
            )
        x = x.astype(jnp.float32)
    else:
        if hflip is not None:
            # NCHW: W is axis 3 (augment.random_hflip flips the same
            # axis pre-transpose; flip commutes with round)
            x = jnp.where(hflip[:, None, None, None], x[..., ::-1], x)
        for i in range(num_layers):
            x = randaugment_layer(
                x, jax.random.fold_in(rng, i), magnitude, magnitude_std, fill,
                op=None if ops_bk is None else ops_bk[:, i],
            )
            x = jnp.round(x)
    return jnp.transpose(x, (0, 2, 3, 1))
