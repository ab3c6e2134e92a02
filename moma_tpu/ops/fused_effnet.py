"""Recompute-style fused EfficientNet forward (NCHW, Pallas) — the
speed-of-light path for the gradient-free teacher key-forward and eval.

Why (measured, see BASELINE.md round-1 analysis): the MoMA step is
bandwidth-bound at ~2.7% MXU utilization; XLA materializes every MBConv
intermediate — in particular the 6x expanded tensors — to HBM, reading
them back for BN statistics, the depthwise conv, SE, and the projection
(~38 input-sized tensor passes per expand-6 block).  The MXU is idle, so
recomputing intermediates is free while HBM reads are not.

Structure (train mode, per MBConv block; block input x stays VMEM-resident
per image — all effiB0 block inputs are <= 4 MB):

  pass1: stats of expand(x)                                  [reads x]
  pass2: stats of dw(silu(bn1(expand(x))))                   [reads x]
  pass3: SE spatial sums of silu(bn2(dw(...)))               [reads x]
  pass4: tmp = proj(se * silu(bn2(dw(...)))) + stats3        [reads x, writes tmp]
  finalize (XLA, elementwise): y = bn3(tmp) [+ x]

≈ 5 input-sized passes instead of ~38.  Eval mode (running statistics)
has no barriers: ONE pass per block.  The expand / depthwise tensors are
never written to HBM.  BN semantics are exactly flax/torch train-mode
batch statistics (the reference forces the momentum encoder's BN to
train mode, helper/loops_moma.py:314-318).

Layout: NCHW inside (W on the 128-lane axis — full utilization at any
channel count, unlike NHWC where C=16..96 pads to 128; depthwise conv =
static lane/sublane shifts).  The device RandAugment stage already
produces NCHW, so the fused path consumes it directly.

This module provides:
  * extract_params(variables)  — flax effiB0 tree -> flat per-block params
  * reference_forward(...)     — pure-jnp NCHW mirror (oracle for tests,
                                 and the non-TPU fallback)
  * fused_forward(...)         — the Pallas pass pipeline
Both return (pooled f32, logits f32, new_batch_stats | None) — the
surface the MoMA teacher key-forward and the eval step need.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from moma_tpu.models.efficientnet import (
    B0_BLOCKS,
    BN_EPS,
    BN_MOMENTUM,
    COEFFS,
    round_filters,
    round_repeats,
)

Array = jax.Array


class BlockSpec(NamedTuple):
    in_filters: int
    out_filters: int
    expand: int          # expand ratio (1 = no expand conv / no bn1)
    kernel: int
    stride: int
    se: int              # squeezed channels
    has_skip: bool


def block_specs(variant: str = "b0") -> List[BlockSpec]:
    width, depth, _res, _drop = COEFFS[variant]
    specs = []
    for ba in B0_BLOCKS:
        inf = round_filters(ba.input_filters, width)
        outf = round_filters(ba.output_filters, width)
        reps = round_repeats(ba.num_repeat, depth)
        for r in range(reps):
            in_f = inf if r == 0 else outf
            stride = ba.stride if r == 0 else 1
            specs.append(
                BlockSpec(
                    in_filters=in_f,
                    out_filters=outf,
                    expand=ba.expand_ratio,
                    kernel=ba.kernel_size,
                    stride=stride,
                    se=max(1, int(in_f * ba.se_ratio)),
                    has_skip=(stride == 1 and in_f == outf),
                )
            )
    return specs


# ---------------------------------------------------------------------------
# parameter extraction (flax effiB0 tree -> NCHW-friendly flat params)


def _bn(params_bn, stats_bn):
    return {
        "scale": params_bn["BatchNorm_0"]["scale"].astype(jnp.float32),
        "bias": params_bn["BatchNorm_0"]["bias"].astype(jnp.float32),
        "mean": stats_bn["BatchNorm_0"]["mean"].astype(jnp.float32),
        "var": stats_bn["BatchNorm_0"]["var"].astype(jnp.float32),
    }


def extract_params(variables, variant: str = "b0"):
    """Pull per-block weights out of the flax EfficientNet variable tree.

    1x1 conv kernels (1,1,Cin,Cout) -> (Cout,Cin); depthwise (k,k,1,C) ->
    (C,k,k); SE convs keep bias.  Mirrors models/efficientnet.py module
    numbering: expand blocks use Conv_0/_BN_0 (expand), Conv_1/_BN_1 (dw),
    Conv_2+Conv_3 (SE), Conv_4/_BN_2 (project); expand==1 blocks shift
    down by one.
    """
    p, bs = variables["params"], variables["batch_stats"]
    specs = block_specs(variant)
    out: Dict[str, Any] = {
        "stem_w": jnp.transpose(p["Conv_0"]["kernel"], (3, 2, 0, 1)),  # (32,3,3,3)
        "stem_bn": _bn(p["_BN_0"], bs["_BN_0"]),
        "head_w": p["Conv_1"]["kernel"][0, 0],                          # (320,1280)
        "head_bn": _bn(p["_BN_1"], bs["_BN_1"]),
        "cls_w": p["classifier"]["kernel"],
        "cls_b": p["classifier"]["bias"],
        "blocks": [],
    }
    for i, s in enumerate(specs):
        bp = p[f"MBConvBlock_{i}"]
        bbs = bs[f"MBConvBlock_{i}"]
        k = 0
        blk: Dict[str, Any] = {}
        if s.expand != 1:
            blk["w_exp"] = bp[f"Conv_{k}"]["kernel"][0, 0].T  # (6C, C)
            blk["bn1"] = _bn(bp["_BN_0"], bbs["_BN_0"])
            k += 1
        blk["w_dw"] = jnp.transpose(bp[f"Conv_{k}"]["kernel"][:, :, 0, :],
                                    (2, 0, 1))               # (6C, k, k)
        blk["bn2"] = _bn(bp[f"_BN_{1 if s.expand != 1 else 0}"],
                         bbs[f"_BN_{1 if s.expand != 1 else 0}"])
        k += 1
        blk["w_se1"] = bp[f"Conv_{k}"]["kernel"][0, 0].T      # (se, 6C)
        blk["b_se1"] = bp[f"Conv_{k}"]["bias"]
        blk["w_se2"] = bp[f"Conv_{k+1}"]["kernel"][0, 0].T    # (6C, se)
        blk["b_se2"] = bp[f"Conv_{k+1}"]["bias"]
        k += 2
        blk["w_proj"] = bp[f"Conv_{k}"]["kernel"][0, 0].T     # (Cout, 6C)
        blk["bn3"] = _bn(bp[f"_BN_{2 if s.expand != 1 else 1}"],
                         bbs[f"_BN_{2 if s.expand != 1 else 1}"])
        out["blocks"].append(blk)
    return out, specs


# ---------------------------------------------------------------------------
# pure-jnp NCHW reference (oracle + non-TPU fallback)


def _stats_nchw(x: Array) -> Tuple[Array, Array]:
    """flax _compute_stats numerics over (N, H, W) of an NCHW tensor."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 2, 3))
    mean2 = jnp.mean(xf * xf, axis=(0, 2, 3))
    var = jnp.maximum(0.0, mean2 - mean * mean)
    return mean, var


def _affine(bn, mean, var) -> Tuple[Array, Array]:
    """Per-channel (a, b) so that bn(x) = a*x + b."""
    a = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)
    return a, bn["bias"] - mean * a


def _bn_apply(x, bn, train, compute_dtype):
    if train:
        mean, var = _stats_nchw(x)
    else:
        mean, var = bn["mean"], bn["var"]
    a, b = _affine(bn, mean, var)
    y = (x.astype(jnp.float32) * a[:, None, None] + b[:, None, None])
    return y.astype(compute_dtype), (mean, var)


def mm_cast(*arrays):
    """CPU XLA cannot execute bf16 x bf16 -> f32 dots; upcast matmul
    operands to f32 off-TPU (tests/interpret).  On TPU: pass through."""
    if jax.default_backend() == "tpu":
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
                for a in arrays)
    return out if len(out) > 1 else out[0]


def _dw_nchw(x, w, stride, kernel):
    """Depthwise conv, NCHW, TF SAME padding (flax padding='SAME')."""
    C = x.shape[1]
    x, w = mm_cast(x, w)
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (1, 2, 0))[:, :, None, :],  # (k,k,1,C)
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=C,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _pw_nchw(x, w):
    """1x1 conv as einsum: (N,C,H,W) x (D,C) -> (N,D,H,W)."""
    a, b = mm_cast(x, w.astype(x.dtype))
    return jnp.einsum(
        "nchw,dc->ndhw", a, b, preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def reference_block(blk, s, h, train, collected, compute_dtype):
    """One MBConv block, pure-jnp NCHW (shared by reference_forward and
    the fused path for blocks too small for the Pallas kernels)."""

    def track(pair):
        if train:
            collected.append(pair)

    inp = h
    if s.expand != 1:
        h = _pw_nchw(h, blk["w_exp"])
        h, st = _bn_apply(h, blk["bn1"], train, compute_dtype)
        track(st)
        h = jax.nn.silu(h)
    h = _dw_nchw(h, blk["w_dw"].astype(compute_dtype), s.stride, s.kernel)
    h, st = _bn_apply(h, blk["bn2"], train, compute_dtype)
    track(st)
    h = jax.nn.silu(h)
    # SE on input-filter squeeze (model.py:58-63 semantics)
    pooled = jnp.mean(h, axis=(2, 3))                       # (N, 6C)
    a1, b1_ = mm_cast(pooled, blk["w_se1"].T.astype(pooled.dtype))
    z = jax.nn.silu((a1 @ b1_).astype(pooled.dtype)
                    + blk["b_se1"].astype(pooled.dtype))
    a2, b2_ = mm_cast(z, blk["w_se2"].T.astype(z.dtype))
    z = jax.nn.sigmoid((a2 @ b2_).astype(z.dtype)
                       + blk["b_se2"].astype(z.dtype))
    h = h * z[:, :, None, None].astype(h.dtype)
    h = _pw_nchw(h, blk["w_proj"])
    h, st = _bn_apply(h, blk["bn3"], train, compute_dtype)
    track(st)
    if s.has_skip:
        h = h + inp
    return h


def reference_forward(params, specs, x, train: bool,
                      compute_dtype=jnp.bfloat16):
    """Pure-jnp NCHW forward.  Returns (pooled f32, logits f32, stats list)
    where stats is [(mean, var), ...] in BN order (stem, per-block bns,
    head) for the running-average update — empty in eval mode."""
    collected = []

    def track(pair):
        if train:
            collected.append(pair)

    x = x.astype(compute_dtype)
    xs, ws = mm_cast(x, jnp.transpose(params["stem_w"], (2, 3, 1, 0)).astype(compute_dtype))
    h = jax.lax.conv_general_dilated(
        xs,
        ws,
        window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
    h, st = _bn_apply(h, params["stem_bn"], train, compute_dtype)
    track(st)
    h = jax.nn.silu(h)

    for blk, s in zip(params["blocks"], specs):
        h = reference_block(blk, s, h, train, collected, compute_dtype)

    h = _pw_nchw(h, params["head_w"].T)  # (320,1280) -> w (1280,320)
    h, st = _bn_apply(h, params["head_bn"], train, compute_dtype)
    track(st)
    h = jax.nn.silu(h)
    pooled = jnp.mean(h, axis=(2, 3)).astype(jnp.float32)       # (N, 1280)
    logits = pooled @ params["cls_w"] + params["cls_b"]
    return pooled, logits, collected


# ---------------------------------------------------------------------------
# running-stats plumbing


def bn_order(specs) -> List[Tuple[str, str]]:
    """(module, bn_name) pairs in the order reference_forward collects."""
    order = [("", "_BN_0")]
    for i, s in enumerate(specs):
        mod = f"MBConvBlock_{i}"
        if s.expand != 1:
            order += [(mod, "_BN_0"), (mod, "_BN_1"), (mod, "_BN_2")]
        else:
            order += [(mod, "_BN_0"), (mod, "_BN_1")]
    order.append(("", "_BN_1"))
    return order


def updated_batch_stats(batch_stats, specs, collected):
    """flax-shaped batch_stats tree with the running EMA applied
    (mean/var <- m*old + (1-m)*batch, m = BN_MOMENTUM)."""
    new = jax.tree_util.tree_map(lambda a: a, batch_stats)  # shallow-ish copy

    def _set(tree, mod, bn, mean, var):
        node = tree[bn] if not mod else tree[mod][bn]
        old_m = node["BatchNorm_0"]["mean"]
        old_v = node["BatchNorm_0"]["var"]
        upd = {
            "mean": BN_MOMENTUM * old_m + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * old_v + (1 - BN_MOMENTUM) * var,
        }
        if not mod:
            tree = dict(tree)
            tree[bn] = {"BatchNorm_0": upd}
            return tree
        tree = dict(tree)
        tree[mod] = dict(tree[mod])
        tree[mod][bn] = {"BatchNorm_0": upd}
        return tree

    for (mod, bn), (mean, var) in zip(bn_order(specs), collected):
        new = _set(new, mod, bn, mean, var)
    return new
