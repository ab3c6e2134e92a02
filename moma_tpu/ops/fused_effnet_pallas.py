"""Pallas kernels for the recompute-style fused EfficientNet forward.

See ops/fused_effnet.py for the why.  Final structure per MBConv block
(converged after measuring two earlier designs on v5e — see BASELINE.md):

  K1 expand-stats: sums of expand(y)            [train only; reads y,
     recomputes the 6x expand on the idle MXU — never materialized]
  K2 dw-once:      dwout = dw(silu(bn1(expand(y)))), written ONCE,
     + its batch statistics                     [reads y, writes dwout]
  SE (XLA):        pooled sigmoid MLP over silu(bn2(dwout)) — one fused
     elementwise+reduce pass
  K4 project:      tmp = proj(se * silu(bn2(dwout))) + stats of tmp
  finalize (XLA):  y' = bn3(tmp) [+ skip]

The expand tensor (the 6x blow-up XLA materializes and re-reads) never
touches HBM; the depthwise output is computed exactly once (an earlier
variant recomputed it per pass and was VPU-bound: 106 ms vs flax 24.5).

Layout (probed): interior tensors are dense NCHW; kernel tiles are
(C planes, H sublanes, W lanes) — W fills the 128-lane axis at any
channel count.  An NHWC/C-on-lanes variant measured slower and VMEM-OOM:
C=16..32 pads 4-8x in VMEM windows.  Per-channel constants are passed
pre-shaped so slicing yields (C,1,1) directly without cross-layout
reshapes (Mosaic rejects (1,C)->(C,1,1)):
  BN affines  (C, 1, 2)   -> ab[:, 0:1, j:j+1]
  dw taps     (C, 1, k*k) -> w[:, 0:1, t:t+1]
  SE scales   (N, C, 1, 1)
1x1 convs are 3-D dot_generals (Cout,Cin)x(Cin,TH,W) (probed).  The
stride-2 depthwise uses the 4-phase decomposition (no strided slices in
Mosaic); stem and head stay in XLA.

Each grid step owns one image (largest effiB0 block input = 4.2 MB
dense); statistics accumulate as (C,) sums across the sequential grid.

Numerics mirror models/efficientnet.py with dtype=bfloat16; silu runs
through explicit f32 internals (Mosaic mis-types the f32->bf16 scalar
broadcast inside jax.nn.sigmoid on bf16 vectors).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moma_tpu.models.efficientnet import BN_EPS
from moma_tpu.ops.fused_effnet import BlockSpec, mm_cast, reference_block

Array = jax.Array
BF16 = jnp.bfloat16
F32 = jnp.float32
# compute dtype for conv/silu intermediates; bf16 in production, f32 for
# exact-oracle tests (set by fused_forward before tracing the kernels)
_CD = BF16


def _set_compute_dtype(dt):
    global _CD
    _CD = dt


def _silu(x):
    xf = x.astype(F32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _seq(n):
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * n,
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _pick_tile(rows: int, cap: int = 16) -> int:
    for t in range(min(cap, rows), 0, -1):
        if rows % t == 0:
            return t
    return rows


def _shift_w(x: Array, d: int) -> Array:
    """Static W (lane) shift with zero fill on (C, R, W):
    out[..., j] = x[..., j+d].  Mosaic rejects lane-concats of zero slabs
    with offset slices; pltpu.roll + iota mask lowers cleanly (probed)."""
    if d == 0:
        return x
    W = x.shape[-1]
    rolled = pltpu.roll(x, (-d) % W, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    keep = (lane < W - d) if d > 0 else (lane >= -d)
    return jnp.where(keep, rolled, jnp.zeros((), x.dtype))


def _pad_rows(t: Array, top: int, bot: int) -> Array:
    """Zero rows on the sublane axis (axis 1) of (C, R, W)."""
    C, R, W = t.shape
    parts = []
    if top:
        parts.append(jnp.zeros((C, top, W), t.dtype))
    parts.append(t)
    if bot:
        parts.append(jnp.zeros((C, bot, W), t.dtype))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else t


def _dot_c(w: Array, slab: Array) -> Array:
    """(Cout, Cin) x (Cin, R, W) -> (Cout, R, W), f32 accumulation."""
    return jax.lax.dot_general(
        *mm_cast(w, slab),
        (((1,), (0,)), ((), ())), preferred_element_type=F32,
    )


def _sum_cn(t: Array) -> Array:
    """(C, R, W) f32 -> (C,) (chained lane+sublane reduces; probed)."""
    return jnp.sum(jnp.sum(t, axis=2), axis=1)


# ---------------------------------------------------------------------------
# in-kernel chain helpers (static bounds resolved in Python)


def _h1_slab(read_rows, wexp_ref, ab1_ref, r0: int, r1: int, H: int,
             apply_exp: bool):
    """h1 = silu(bn1(expand(y))) rows [r0, r1) clipped to [0, H), padded
    back with zeros: (E, r1-r0, W).  read_rows(c0, c1) -> (C, c1-c0, W)."""
    c0, c1 = max(r0, 0), min(r1, H)
    rows = read_rows(c0, c1).astype(_CD)
    if apply_exp:
        ex = _dot_c(wexp_ref[:], rows).astype(_CD)
        a = ab1_ref[:, 0:1, 0:1]
        b = ab1_ref[:, 0:1, 1:2]
        ex = _silu((ex.astype(F32) * a + b).astype(_CD))
    else:
        ex = rows
    return _pad_rows(ex, c0 - r0, r1 - c1)


def _dw_s1(h: Array, wdw_ref, k: int) -> Array:
    """Stride-1 depthwise over halo'd slab (E, TH+k-1, W) -> f32
    (E, TH, W).  wdw_ref (E, 1, k*k)."""
    p = (k - 1) // 2
    TH = h.shape[1] - (k - 1)
    acc = None
    for ki in range(k):
        rows = h[:, ki:ki + TH, :].astype(F32)
        for kj in range(k):
            w = wdw_ref[:, 0:1, ki * k + kj:ki * k + kj + 1]
            term = w * _shift_w(rows, kj - p)
            acc = term if acc is None else acc + term
    return acc


def _dw_s2(phase_slabs, wdw_ref, TH: int, dmin: int, k: int) -> Array:
    """Stride-2 depthwise from 4 phase slabs (E, TH+dmax-dmin, W2).
    TF SAME s2: k3 -> pad (0,1), k5 -> pad (1,2); tap t = ki - plo maps
    output row i to row i + t//2 of phase t % 2."""
    plo = 0 if k == 3 else 1
    acc = None
    for ki in range(k):
        t = ki - plo
        ph_r, dr = t % 2, t // 2
        for kj in range(k):
            u = kj - plo
            ph_c, dc = u % 2, u // 2
            slab = phase_slabs[(ph_r, ph_c)]
            rows = slab[:, dr - dmin: dr - dmin + TH, :].astype(F32)
            w = wdw_ref[:, 0:1, ki * k + kj:ki * k + kj + 1]
            term = w * _shift_w(rows, dc)
            acc = term if acc is None else acc + term
    return acc


def _dw_rows(cfg, y_ref, wexp_ref, ab1_ref, wdw_ref, r0: int, TH: int):
    """Depthwise output rows [r0, r0+TH) (pre-bn2), f32 (E, TH, W_out)."""
    k = cfg["k"]
    apply_exp = cfg["apply_exp"]
    if cfg["stride"] == 1:
        p = (k - 1) // 2
        read = lambda c0, c1: y_ref[0, :, c0:c1, :]
        h = _h1_slab(read, wexp_ref, ab1_ref, r0 - p, r0 + TH + p,
                     cfg["H"], apply_exp)
        return _dw_s1(h, wdw_ref, k)
    plo = 0 if k == 3 else 1
    ds = [(ki - plo) // 2 for ki in range(k)]
    dmin, dmax = min(ds), max(ds)
    H2 = cfg["H"] // 2
    slabs = {}
    for ph_r in (0, 1):
        for ph_c in (0, 1):
            ph = ph_r * 2 + ph_c
            read = lambda c0, c1, _ph=ph: y_ref[0, _ph, :, c0:c1, :]
            slabs[(ph_r, ph_c)] = _h1_slab(
                read, wexp_ref, ab1_ref, r0 + dmin, r0 + TH + dmax,
                H2, apply_exp)
    return _dw_s2(slabs, wdw_ref, TH, dmin, k)


# ---------------------------------------------------------------------------
# kernels


def _k1_kernel(cfg, y_ref, wexp_ref, s_ref, q_ref):
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    H, TH = cfg["H"], cfg["TH"]
    acc_s = None
    acc_q = None
    for r0 in range(0, H, TH):
        ex = _dot_c(wexp_ref[:], y_ref[0, :, r0:r0 + TH, :].astype(_CD))
        exf = ex.astype(_CD).astype(F32)
        s = _sum_cn(exf)
        q = _sum_cn(exf * exf)
        acc_s = s if acc_s is None else acc_s + s
        acc_q = q if acc_q is None else acc_q + q
    s_ref[:] += acc_s
    q_ref[:] += acc_q


def _k2_kernel(cfg, y_ref, wexp_ref, ab1_ref, wdw_ref, dw_ref, s_ref,
               q_ref):
    """Depthwise output computed ONCE (VPU-heavy; an earlier design that
    recomputed it per pass was VPU-bound), written + batch statistics."""
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    Ho, TH = cfg["Ho"], cfg["THo"]
    acc_s = None
    acc_q = None
    for r0 in range(0, Ho, TH):
        dw = _dw_rows(cfg, y_ref, wexp_ref, ab1_ref, wdw_ref, r0, TH)
        dwb = dw.astype(_CD)
        dw_ref[0, :, r0:r0 + TH, :] = dwb
        dwf = dwb.astype(F32)
        s = _sum_cn(dwf)
        q = _sum_cn(dwf * dwf)
        acc_s = s if acc_s is None else acc_s + s
        acc_q = q if acc_q is None else acc_q + q
    s_ref[:] += acc_s
    q_ref[:] += acc_q


def _k4_kernel(cfg, dw_ref, ab2_ref, se_ref, wproj_ref, tmp_ref, s_ref,
               q_ref):
    """tmp = proj(se * silu(bn2(dwout))) + stats of tmp."""
    n = pl.program_id(0)

    @pl.when(n == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    Ho, TH = cfg["Ho"], cfg["THo"]
    # f32: Mosaic can't broadcast a bf16 (E,1,1) over sublanes+lanes
    sev = se_ref[0]  # (E, 1, 1) f32
    a = ab2_ref[:, 0:1, 0:1]
    b = ab2_ref[:, 0:1, 1:2]
    acc_s = None
    acc_q = None
    for r0 in range(0, Ho, TH):
        dwb = dw_ref[0, :, r0:r0 + TH, :]
        h2 = _silu((dwb.astype(F32) * a + b).astype(_CD))
        scaled = (h2.astype(F32) * sev).astype(_CD)
        proj = _dot_c(wproj_ref[:], scaled).astype(_CD)
        tmp_ref[0, :, r0:r0 + TH, :] = proj
        pf = proj.astype(F32)
        s = _sum_cn(pf)
        q = _sum_cn(pf * pf)
        acc_s = s if acc_s is None else acc_s + s
        acc_q = q if acc_q is None else acc_q + q
    s_ref[:] += acc_s
    q_ref[:] += acc_q


# ---------------------------------------------------------------------------
# host-side orchestration


def _vec_spec(shape):
    return pl.BlockSpec(tuple(shape),
                        lambda n: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _img_spec(shape):
    nd = len(shape)
    return pl.BlockSpec((1,) + tuple(shape),
                        lambda n: (n,) + tuple(0 for _ in range(nd)),
                        memory_space=pltpu.VMEM)


def _sums_out(C):
    return (
        [jax.ShapeDtypeStruct((C,), F32), jax.ShapeDtypeStruct((C,), F32)],
        [pl.BlockSpec((C,), lambda n: (0,), memory_space=pltpu.VMEM),
         pl.BlockSpec((C,), lambda n: (0,), memory_space=pltpu.VMEM)],
    )


def _affine_planes(bn_scale, bn_bias, mean, var):
    """(C, 1, 2) f32 — sliceable to (C,1,1) inside kernels."""
    a = bn_scale * jax.lax.rsqrt(var + BN_EPS)
    b = bn_bias - mean * a
    return jnp.stack([a, b], axis=-1)[:, None, :].astype(F32)


def _mv(s, q, count):
    mean = s / count
    var = jnp.maximum(0.0, q / count - mean * mean)
    return mean, var


def _phase_split(y):
    """(N, C, H, W) -> (N, 4, C, H/2, W/2), phase = 2*(row%2)+col%2."""
    return jnp.stack(
        [y[:, :, 0::2, 0::2], y[:, :, 0::2, 1::2],
         y[:, :, 1::2, 0::2], y[:, :, 1::2, 1::2]], axis=1)


def fused_forward(params, specs: Sequence[BlockSpec], x_nhwc: Array,
                  train: bool, interpret: bool = False,
                  compute_dtype=BF16):
    """Fused forward; NHWC input (stem runs in XLA, interior is NCHW).
    Returns (pooled f32, logits f32, collected stats)."""
    N, H, W, _ = x_nhwc.shape
    _set_compute_dtype(compute_dtype)
    collected: List = []
    x = x_nhwc.astype(_CD)

    # ---- stem (XLA: C=3 input; conv+stats is one fusion there anyway)
    w_stem = jnp.transpose(params["stem_w"], (2, 3, 1, 0))  # HWIO
    xs, ws = mm_cast(x, w_stem.astype(_CD))
    tmp = jax.lax.conv_general_dilated(
        xs, ws, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=F32,
    ).astype(_CD)
    bn = params["stem_bn"]
    if train:
        tf_ = tmp.astype(F32)
        mean = jnp.mean(tf_, axis=(0, 1, 2))
        var = jnp.maximum(0.0, jnp.mean(tf_ * tf_, axis=(0, 1, 2))
                          - mean * mean)
        collected.append((mean, var))
    else:
        mean, var = bn["mean"], bn["var"]
    a = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)
    b = bn["bias"] - mean * a
    # finalize + NHWC -> NCHW entry transpose in one XLA fusion
    y = jax.nn.silu((tmp.astype(F32) * a + b).astype(_CD))
    y = jnp.transpose(y, (0, 3, 1, 2))

    curH = H // 2
    for blk, spec in zip(params["blocks"], specs):
        # Pallas pays off on the large-W stages (256^2/128^2, where the
        # 6x expand materialization dominates traffic); below W=128 the
        # slab->matmul lane merge is not lowerable and tensors are small:
        # those blocks run the plain-jnp NCHW path under XLA.
        if min(y.shape[3], y.shape[3] // spec.stride) >= 128:
            y, curH = _fused_block(blk, spec, y, curH, train, collected,
                                   interpret)
        else:
            y = reference_block(blk, spec, y, train, collected, _CD)
            curH = curH // spec.stride

    # ---- head (XLA; small tensors)
    h = jnp.einsum("nchw,cd->ndhw",
                   *mm_cast(y, params["head_w"].astype(_CD)),
                   preferred_element_type=F32).astype(_CD)
    bnh = params["head_bn"]
    if train:
        hf = h.astype(F32)
        mean = jnp.mean(hf, axis=(0, 2, 3))
        var = jnp.maximum(0.0, jnp.mean(hf * hf, axis=(0, 2, 3))
                          - mean * mean)
        collected.append((mean, var))
    else:
        mean, var = bnh["mean"], bnh["var"]
    a = bnh["scale"] * jax.lax.rsqrt(var + BN_EPS)
    b = bnh["bias"] - mean * a
    h = jax.nn.silu((h.astype(F32) * a[None, :, None, None]
                     + b[None, :, None, None]).astype(_CD))
    pooled = jnp.mean(h, axis=(2, 3)).astype(F32)
    logits = pooled @ params["cls_w"] + params["cls_b"]
    return pooled, logits, collected


def _fused_block(blk, spec: BlockSpec, y, curH, train, collected,
                 interpret):
    N, C, _, W = y.shape
    E = C * spec.expand
    Ho = curH // spec.stride
    Wo = W // spec.stride
    apply_exp = spec.expand != 1
    cfg = {
        "H": curH, "k": spec.kernel, "stride": spec.stride,
        "Ho": Ho, "TH": _pick_tile(curH), "THo": _pick_tile(Ho),
        "apply_exp": apply_exp,
    }
    wexp = blk["w_exp"].astype(_CD) if apply_exp else jnp.zeros((1, 1), _CD)
    wdw = blk["w_dw"].reshape(E, 1, -1).astype(F32)  # (E, 1, k*k)
    cnt_full = N * curH * W
    cnt_out = N * Ho * Wo

    if spec.stride == 2:
        y_in = _phase_split(y)
        y_in_spec = _img_spec(y_in.shape[1:])
    else:
        y_in = y
        y_in_spec = _img_spec(y.shape[1:])

    # K1: expand stats (reads the unsplit input; expand precedes stride)
    if apply_exp:
        if train:
            outs, outspecs = _sums_out(E)
            s1, q1 = pl.pallas_call(
                functools.partial(_k1_kernel, cfg),
                name=f"k1_c{C}_h{curH}", grid=(N,),
                in_specs=[_img_spec(y.shape[1:]), _vec_spec(wexp.shape)],
                out_specs=outspecs, out_shape=outs,
                compiler_params=_seq(1), interpret=interpret,
            )(y, wexp)
            m1, v1 = _mv(s1, q1, cnt_full)
            collected.append((m1, v1))
        else:
            m1, v1 = blk["bn1"]["mean"], blk["bn1"]["var"]
        ab1 = _affine_planes(blk["bn1"]["scale"], blk["bn1"]["bias"],
                             m1, v1)
    else:
        ab1 = jnp.zeros((E, 1, 2), F32)

    # K2: depthwise once -> dwout (NCHW) + stats
    outs, outspecs = _sums_out(E)
    dw_shape = jax.ShapeDtypeStruct((N, E, Ho, Wo), _CD)
    dwout, s2, q2 = pl.pallas_call(
        functools.partial(_k2_kernel, cfg),
        name=f"k2_c{C}_h{curH}_s{spec.stride}", grid=(N,),
        in_specs=[y_in_spec, _vec_spec(wexp.shape),
                  _vec_spec(ab1.shape), _vec_spec(wdw.shape)],
        out_specs=[_img_spec(dw_shape.shape[1:])] + outspecs,
        out_shape=[dw_shape] + outs,
        compiler_params=_seq(1), interpret=interpret,
    )(y_in, wexp, ab1, wdw)
    if train:
        m2, v2 = _mv(s2, q2, cnt_out)
        collected.append((m2, v2))
    else:
        m2, v2 = blk["bn2"]["mean"], blk["bn2"]["var"]
    ab2 = _affine_planes(blk["bn2"]["scale"], blk["bn2"]["bias"], m2, v2)

    # SE pooling in XLA (one fused elementwise+reduce over dwout)
    a2 = ab2[:, 0, 0][None, :, None, None]
    b2 = ab2[:, 0, 1][None, :, None, None]
    h2f = dwout.astype(F32) * a2 + b2
    h2f = h2f * jax.nn.sigmoid(h2f)
    pooled = jnp.mean(h2f, axis=(2, 3)).astype(_CD)  # (N, E)
    u1, u2 = mm_cast(pooled, blk["w_se1"].T.astype(_CD))
    z = jax.nn.silu((u1 @ u2).astype(_CD) + blk["b_se1"].astype(_CD))
    u3, u4 = mm_cast(z, blk["w_se2"].T.astype(_CD))
    se = jax.nn.sigmoid((u3 @ u4).astype(_CD)
                        + blk["b_se2"].astype(_CD)).astype(F32)

    # K4: project from dwout + tmp + stats
    outs, outspecs = _sums_out(spec.out_filters)
    tmp_shape = jax.ShapeDtypeStruct((N, spec.out_filters, Ho, Wo), _CD)
    wproj = blk["w_proj"].astype(_CD)
    se_p = se[:, :, None, None]  # (N, E, 1, 1)
    tmp, s3, q3 = pl.pallas_call(
        functools.partial(_k4_kernel, cfg),
        name=f"k4_c{C}_h{curH}_s{spec.stride}", grid=(N,),
        in_specs=[_img_spec(dw_shape.shape[1:]), _vec_spec(ab2.shape),
                  _img_spec(se_p.shape[1:]), _vec_spec(wproj.shape)],
        out_specs=[_img_spec(tmp_shape.shape[1:])] + outspecs,
        out_shape=[tmp_shape] + outs,
        compiler_params=_seq(1), interpret=interpret,
    )(dwout, ab2, se_p, wproj)
    if train:
        m3, v3 = _mv(s3, q3, cnt_out)
        collected.append((m3, v3))
    else:
        m3, v3 = blk["bn3"]["mean"], blk["bn3"]["var"]
    a3 = blk["bn3"]["scale"] * jax.lax.rsqrt(v3 + BN_EPS)
    b3 = blk["bn3"]["bias"] - m3 * a3

    # finalize (XLA elementwise): y' = bn3(tmp) [+ skip]
    out = (tmp.astype(F32) * a3[None, :, None, None]
           + b3[None, :, None, None]).astype(_CD)
    if spec.has_skip:
        out = out + y
    return out, Ho
