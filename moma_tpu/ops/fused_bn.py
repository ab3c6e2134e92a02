"""Fused BatchNorm reductions (Pallas TPU) — the round-1 trace lever.

Device-trace finding (BASELINE.md): 56% of the MoMA step (104.8 of 187 ms)
is BatchNorm batch-stats + grad `convert_reduce` fusions.  The data they
re-read is only ~3-4 GB/step, which at v5e HBM bandwidth (~819 GB/s) is
~5 ms — XLA's channel reductions over NHWC activations run at a few
percent of peak because a reduce over (N,H,W) with C on the minor axis
uses only C of the 128 lanes when C < 128 (effiB0 stages have C = 16..96
for the largest maps), and each BN gets its own small fusion.

Fix: lane-packed channel reductions.  View the activation (row-major,
channels minor) as a 2-D array of shape (R/m, m*C) with
m = 128 / gcd(C, 128), so every 128-lane vector register is fully
occupied no matter the channel count; a Pallas kernel streams row blocks
HBM->VMEM once and accumulates f32 sum / sum-of-squares per lane; the
(m, C) lane copies are folded outside the kernel (tiny).  The same
packing serves the backward reductions sum(dy), sum(dy*(x-mean)).

`fused_bn_train` is a custom-VJP train-mode BatchNorm whose forward and
backward reductions go through these kernels; `FusedBatchNorm` is a
drop-in flax module with nn.BatchNorm's exact variable structure
(params: scale/bias, batch_stats: mean/var) and numerics (f32 stats,
fast-variance E[x^2]-E[x]^2 clipped at 0, flax's normalize order), so
checkpoints and the torch importer are untouched.

Mode (set_fused_bn / MOMA_FUSED_BN env):
  'flax' / 'off': plain flax-equivalent autodiff path (no custom_vjp).
  'xla':  custom-VJP train BN with jnp (XLA) reductions — explicit
      backward over SAVED residuals, which blocks XLA's autodiff
      fusion pathology (producer chains recomputed inside the grad
      reduce fusions) while keeping XLA's fast reduce codegen.
  'pallas' / 'on': custom-VJP with the lane-packed Pallas reductions.
  'auto' (default): 'xla' on single-device TPU (measured best, see
      BASELINE.md); 'flax' otherwise (CPU mesh tests, multi-chip jit —
      custom_partitioning for the pallas path is round-2 work).

Measured (v5e, device-trace, standalone (64,256,256,C) bf16): XLA's own
channel reduce already streams at 344-377 GB/s and a standalone flax BN
fwd+bwd hits ~280 GB/s effective — the in-model 104.8 ms is autodiff
fusion structure, not reduce throughput; the pallas kernels measured
29-58 GB/s (operand copy forced ahead of the custom call) and are kept
as an explicitly-selectable experiment, not the default.

Reference semantics being accelerated: torch BN train mode inside
`helper/loops_moma.py` (student fwd + teacher key fwd with BN forced to
train mode, loops_moma.py:314-318) — behavior unchanged, only faster.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MODE = os.environ.get("MOMA_FUSED_BN", "auto")

# VMEM budget per input block (bytes); two such blocks in flight with
# double buffering plus accumulators stays well under the ~16 MB/core.
_BLOCK_BYTES = 2 * 1024 * 1024
_MAX_LANES = 65536  # refuse absurd pack widths


_MODES = ("auto", "flax", "off", "xla", "pallas", "on")


def set_fused_bn(mode: str) -> None:
    """'auto' | 'flax'/'off' | 'xla' | 'pallas'/'on' — see module docstring."""
    global _MODE
    assert mode in _MODES, mode
    _MODE = mode


# Default cross-replica axis for EVERY FusedBatchNorm traced while the
# context is active (sync-BN under shard_map without plumbing axis_name
# through each backbone's constructor).  Trace-time effect: enter the
# context around the shard_map body — see train/moma.py bn='sync'.
_DEFAULT_AXIS_NAME: Optional[str] = None


@contextlib.contextmanager
def bn_axis_name(name: Optional[str]):
    """While active, BatchNorms traced without an explicit axis_name pmean
    their batch statistics over mesh axis `name` (sync-BN)."""
    global _DEFAULT_AXIS_NAME
    prev = _DEFAULT_AXIS_NAME
    _DEFAULT_AXIS_NAME = name
    try:
        yield
    finally:
        _DEFAULT_AXIS_NAME = prev


def current_bn_axis() -> Optional[str]:
    """The active bn_axis_name() default (None outside the context).
    For modules that use plain flax BatchNorm (e.g. the 1-D mlp_byol
    projection head) and must still join sync-BN reductions."""
    return _DEFAULT_AXIS_NAME


def _resolved_mode() -> str:
    """'flax' | 'xla' | 'pallas' after resolving aliases and 'auto'."""
    m = {"off": "flax", "on": "pallas"}.get(_MODE, _MODE)
    if m != "auto":
        return m
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        return "xla"
    return "flax"


def _pallas_enabled() -> bool:
    return _resolved_mode() == "pallas"


def _pack_width(C: int) -> int:
    """Rows of the packed view hold m channels-worth of elements so that
    m*C is a multiple of the 128-lane register width."""
    return 128 // math.gcd(C, 128)


def _pick_block_rows(R2: int, W: int, itemsize: int) -> int:
    """Largest divisor of R2 with block bytes <= _BLOCK_BYTES (>=8 rows)."""
    cap = max(8, _BLOCK_BYTES // max(1, W * itemsize))
    cap = min(cap, R2)
    for br in range(cap, 7, -1):
        if R2 % br == 0:
            return br
    return 0


def _fold(sums_w: Array, m: int, C: int) -> Array:
    """(…, m*C) lane-packed partial sums -> (…, C)."""
    return sums_w.reshape(sums_w.shape[:-1] + (m, C)).sum(axis=-2)


# ---------------------------------------------------------------------------
# kernels


def _sums_kernel(x_ref, s_ref, q_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    blk = x_ref[:].astype(jnp.float32)
    s_ref[:] += jnp.sum(blk, axis=0, keepdims=True)
    q_ref[:] += jnp.sum(blk * blk, axis=0, keepdims=True)


def _grad_sums_kernel(dy_ref, x_ref, mw_ref, s_ref, p_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_ref[:] = jnp.zeros_like(s_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    dy = dy_ref[:].astype(jnp.float32)
    xm = x_ref[:].astype(jnp.float32) - mw_ref[:]
    s_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    p_ref[:] += jnp.sum(dy * xm, axis=0, keepdims=True)


def _pallas_channel_sums(x2: Array, block_rows: int, interpret: bool):
    """x2 (R2, W) -> (sum, sumsq) each (1, W) f32.  Sequential grid over
    row blocks; accumulates directly into the (grid-invariant) outputs."""
    R2, W = x2.shape
    grid = (R2 // block_rows,)
    return pl.pallas_call(
        _sums_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2)


def _pallas_grad_sums(dy2: Array, x2: Array, mean_w: Array,
                      block_rows: int, interpret: bool):
    R2, W = x2.shape
    grid = (R2 // block_rows,)
    return pl.pallas_call(
        _grad_sums_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(dy2, x2, mean_w)


# ---------------------------------------------------------------------------
# packed reductions with XLA fallback


def _packable(shape: Tuple[int, ...]) -> Optional[Tuple[int, int, int, int]]:
    """Returns (R, C, m, block_rows) if the lane-packed kernel applies."""
    C = shape[-1]
    R = 1
    for d in shape[:-1]:
        R *= d
    if C < 1 or R < 64:
        return None
    m = _pack_width(C)
    W = m * C
    if W > _MAX_LANES or R % m:
        return None
    br = _pick_block_rows(R // m, W, 2)
    if not br:
        return None
    return R, C, m, br


def channel_sums(x: Array, interpret: bool = False):
    """sum(x) and sum(x*x) over all axes but the last, in f32.

    Lane-packed Pallas on TPU; jnp fallback elsewhere (XLA inserts the
    cross-device psum itself when x is sharded under jit).
    """
    pack = _packable(x.shape) if (_pallas_enabled() or interpret) else None
    if pack is None:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        return jnp.sum(xf, axes), jnp.sum(xf * xf, axes)
    R, C, m, br = pack
    x2 = x.reshape(R // m, m * C)
    interpret = interpret or jax.default_backend() != "tpu"
    s, q = _pallas_channel_sums(x2, br, interpret)
    return _fold(s[0], m, C), _fold(q[0], m, C)


def grad_channel_sums(dy: Array, x: Array, mean: Array,
                      interpret: bool = False):
    """sum(dy) and sum(dy * (x - mean)) over all axes but the last (f32)."""
    pack = _packable(x.shape) if (_pallas_enabled() or interpret) else None
    if pack is None:
        dyf = dy.astype(jnp.float32)
        xm = x.astype(jnp.float32) - mean
        axes = tuple(range(x.ndim - 1))
        return jnp.sum(dyf, axes), jnp.sum(dyf * xm, axes)
    R, C, m, br = pack
    dy2 = dy.reshape(R // m, m * C)
    x2 = x.reshape(R // m, m * C)
    mean_w = jnp.tile(mean.astype(jnp.float32), m)[None, :]
    interpret = interpret or jax.default_backend() != "tpu"
    s, p = _pallas_grad_sums(dy2, x2, mean_w, br, interpret)
    return _fold(s[0], m, C), _fold(p[0], m, C)


def channel_stats(x: Array, interpret: bool = False):
    """(mean, var) over all axes but the last — flax `_compute_stats`
    numerics (f32, fast variance clipped at 0)."""
    C = x.shape[-1]
    n = x.size // C
    s, q = channel_sums(x, interpret)
    mean = s / n
    var = jnp.maximum(0.0, q / n - mean * mean)
    return mean, var


# ---------------------------------------------------------------------------
# custom-VJP train-mode batch norm


def _normalize(x, mean, var, scale, bias, eps, out_dtype):
    """flax `_normalize` op order (normalization.py): y=(x-mean)*mul+bias
    with mul = rsqrt(var+eps)*scale, computed in f32, cast to out_dtype."""
    y = x - mean
    mul = jax.lax.rsqrt(var + eps) * scale
    y = y * mul + bias
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_bn_train(x: Array, scale: Array, bias: Array, eps: float,
                   out_dtype: Any):
    """Train-mode batch norm over the minor (channel) axis.

    Returns (y, mean, var); mean/var are f32 batch statistics intended
    for the running-average update and are treated as STOP-GRADIENT
    outputs (their cotangents are ignored in the VJP — running stats are
    buffers, exactly torch/flax semantics).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, out_dtype)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, out_dtype):
    mean, var = channel_stats(x)
    invstd = jax.lax.rsqrt(var + eps)
    y = _normalize(x, mean, var, scale.astype(jnp.float32),
                   bias.astype(jnp.float32), eps, out_dtype)
    return y, mean, var, invstd


def _bn_fwd(x, scale, bias, eps, out_dtype):
    y, mean, var, invstd = _bn_fwd_impl(x, scale, bias, eps, out_dtype)
    return (y, mean, var), (x, scale, mean, invstd)


def _bn_bwd(eps, out_dtype, res, cts):
    dy, _d_mean, _d_var = cts  # stats outputs are buffer-like: no grad path
    x, scale, mean, invstd = res
    C = x.shape[-1]
    n = x.size // C
    sum_dy, sum_dy_xm = grad_channel_sums(dy, x, mean)
    g = scale.astype(jnp.float32) * invstd
    # d/dscale of y = xhat = (x-mean)*invstd
    dscale = (sum_dy_xm * invstd).astype(scale.dtype)
    dbias = sum_dy.astype(scale.dtype)
    t1 = sum_dy / n
    t2 = (sum_dy_xm / n) * (invstd * invstd)
    dx = g * (dy.astype(jnp.float32) - t1
              - (x.astype(jnp.float32) - mean) * t2)
    return dx.astype(x.dtype), dscale, dbias


fused_bn_train.defvjp(_bn_fwd, _bn_bwd)


# ---------------------------------------------------------------------------
# flax drop-in


def _canonical_out_dtype(x, dtype):
    from flax.linen import dtypes as _dtypes

    return _dtypes.canonicalize_dtype(
        x, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32), dtype=dtype
    )


class FusedBatchNorm(nn.Module):
    """nn.BatchNorm drop-in (feature axis -1, use_bias/use_scale always on)
    whose train-mode statistics and gradient reductions use the
    lane-packed Pallas kernels.  Variable structure and numerics match
    flax nn.BatchNorm exactly (see module docstring); pass
    ``name='BatchNorm_0'`` to keep existing parameter paths."""

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (C,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (C,)
        )
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        out_dtype = _canonical_out_dtype(x, self.dtype)

        if self.use_running_average:
            return _normalize(
                x, ra_mean.value, ra_var.value, scale, bias, self.epsilon,
                out_dtype,
            )

        axis_name = self.axis_name or _DEFAULT_AXIS_NAME
        if axis_name is None and _resolved_mode() != "flax":
            y, mean, var = fused_bn_train(
                x, scale, bias, self.epsilon, out_dtype
            )
        else:  # flax-equivalent autodiff path (+ optional sync-BN pmean)
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            stacked = jnp.stack([jnp.mean(xf, axes), jnp.mean(xf * xf, axes)])
            if axis_name is not None:
                stacked = jax.lax.pmean(stacked, axis_name)
            mean, mean2 = stacked
            var = jnp.maximum(0.0, mean2 - mean * mean)
            y = _normalize(x, mean, var, scale, bias, self.epsilon, out_dtype)

        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value
                + (1.0 - self.momentum) * jax.lax.stop_gradient(mean)
            )
            ra_var.value = (
                self.momentum * ra_var.value
                + (1.0 - self.momentum) * jax.lax.stop_gradient(var)
            )
        return y
