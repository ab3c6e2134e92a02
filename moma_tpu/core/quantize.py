"""Post-training int8 quantization for the serving path.

The reference has no quantization story at all (its only precision
feature is optional apex AMP in training, contrast_trainer.py:40-69).
For TPU serving this leaves 2x on the table: the v5e MXU executes
int8 x int8 -> int32 matmuls/convs at twice the bf16 rate, and int8
activations halve the HBM traffic of the bandwidth-bound conv stages.

Design — Flax method interception, zero model changes:

  * `calibrate(apply_fn, variables, batches)` runs ordinary forwards
    with an `nn.intercept_methods` hook that records the absmax of every
    `nn.Conv` input, keyed by module path -> per-tensor activation
    scales.
  * `quantized_apply(apply_fn, act_scales)` returns a drop-in
    replacement for `apply_fn` in which every calibrated conv runs as
      q_x  = round(x / s_x)           clipped to [-127, 127], int8
      q_w  = round(w / s_w[oc])       per-output-channel scale, int8
      y    = conv(q_x, q_w) -> int32  (the MXU int8 path)
      out  = y * (s_x * s_w) + bias   fp epilogue (BN/activations stay fp)
    Symmetric quantization (no zero points) — the TPU-idiomatic scheme.

Because interception happens at trace time, the quantized graph exports
through `jax.export` unchanged: `export_classifier(quantized_apply(...))`
bakes an int8 serving artifact.

Works for every backbone in the zoo.  With dense=True, nn.Dense trunk
layers quantize too (the ViT path: 48 dense matmuls in vit_tiny) —
but never a final-logits Dense (see `calibrate` for the exclusion
rule) and never TorchLinear classifiers (raw jnp.dot, not intercepted);
normalization and activations stay fp — the standard PTQ recipe.  Convs
with exotic config (input dilation, masks) fall back to fp silently.
`quantized_apply_dynamic` is the calibration-free variant (per-batch
in-graph act scales) used by `--int8_dynamic` and the training-side
`--teacher_quant int8` (train/moma.py::_teacher_apply).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

QMAX = 127.0


def _path_key(mod: nn.Module) -> str:
    return "/".join(str(p) for p in mod.path)


def _pairs(v, nd: int):
    """Normalize an nn.Conv stride/dilation attribute to an nd-tuple."""
    if v is None:
        return (1,) * nd
    if isinstance(v, int):
        return (v,) * nd
    return tuple(v)


def _padding(v, nd: int):
    """Normalize nn.Conv padding to what lax.conv_general_dilated takes."""
    if isinstance(v, str):
        return v  # 'SAME' / 'VALID' (flax 'CIRCULAR' is rejected earlier)
    if isinstance(v, int):
        return ((v, v),) * nd
    out = []
    for p in v:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def _supported(mod: nn.Conv, x: jax.Array) -> bool:
    if x.ndim != 4:  # NHWC convs only (the whole zoo)
        return False
    if isinstance(mod.padding, str) and mod.padding not in ("SAME", "VALID"):
        return False  # CIRCULAR / CAUSAL need pre-padding; keep fp
    if getattr(mod, "mask", None) is not None:
        return False
    if _pairs(getattr(mod, "input_dilation", 1), 2) != (1, 1):
        return False
    return True


def _is_conv_call(context) -> bool:
    return (isinstance(context.module, nn.Conv)
            and context.method_name == "__call__")


def _is_dense_call(context) -> bool:
    return (isinstance(context.module, nn.Dense)
            and context.method_name == "__call__")


def _supported_dense(mod: nn.Dense, x: jax.Array) -> bool:
    return x.ndim >= 2


def calibration_interceptor(stats: Dict[str, jax.Array],
                            dense: bool = False,
                            order: Optional[list] = None):
    """Records running absmax of every nn.Conv (and, with dense=True,
    nn.Dense) input into `stats`; appends (path, kind, out_features) to
    `order` in call order when given."""

    def interceptor(next_fun, args, kwargs, context):
        kind = None
        if not args:  # kwargs-only call: leave untouched
            return next_fun(*args, **kwargs)
        if _is_conv_call(context) and _supported(context.module, args[0]):
            kind = "conv"
        elif (dense and _is_dense_call(context)
              and _supported_dense(context.module, args[0])):
            kind = "dense"
        if kind is not None:
            key = _path_key(context.module)
            amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            stats[key] = jnp.maximum(stats[key], amax) if key in stats else amax
            if order is not None:
                order.append((key, kind, context.module.features
                              if kind == "dense" else None))
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate(
    apply_fn: Callable,
    variables: dict,
    batches: Iterable[jax.Array],
    dense: bool = False,
    n_cls: Optional[int] = None,
    **apply_kwargs,
) -> Dict[str, float]:
    """Run forwards over `batches`, return {module_path: activation_scale}.

    The scale is absmax/127 over all batches (per-tensor, symmetric).
    dense=True also calibrates nn.Dense layers (the ViT trunk), EXCEPT a
    final-call logits Dense: vgg/mobilenetv2 use nn.Dense as their
    classifier (everything else uses TorchLinear, never intercepted),
    and standard PTQ keeps the classifier fp.  The exclusion triggers
    when the LAST intercepted call is a Dense and (if n_cls is given)
    its width equals n_cls.  `apply_kwargs` forward to apply_fn.
    """
    # interception happens at TRACE time, so the whole calibration
    # forward jits: the stats dict (tracers when recorded) comes back as
    # jit outputs.  Eager execution would be one relay RTT per op on the
    # axon TPU (measured: minutes per forward for effiB0).
    order: list = []

    @jax.jit
    def calib_fn(variables, x):
        order.clear()  # retraces append again; keep one trace's order
        stats: Dict[str, jax.Array] = {}
        with nn.intercept_methods(
                calibration_interceptor(stats, dense=dense, order=order)):
            apply_fn(variables, x, **apply_kwargs)
        return stats

    amax: Dict[str, float] = {}
    for x in batches:
        for k, v in jax.device_get(calib_fn(variables, x)).items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    if dense and order:
        last_key, last_kind, last_feat = order[-1]
        if last_kind == "dense" and (n_cls is None or last_feat == n_cls):
            amax.pop(last_key, None)  # the logits layer stays fp
    return {k: max(v, 1e-6) / QMAX for k, v in amax.items()}


def _quantized_conv(mod: nn.Conv, x: jax.Array, s_x: float) -> jax.Array:
    params = mod.variables["params"]
    kernel = jnp.asarray(params["kernel"], jnp.float32)  # (kh, kw, in/g, out)
    out_dtype = (mod.dtype or jnp.promote_types(x.dtype, params["kernel"].dtype))

    # per-output-channel weight scales
    s_w = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    s_w = jnp.maximum(s_w, 1e-8) / QMAX  # (out,)
    q_w = jnp.clip(jnp.round(kernel / s_w), -QMAX, QMAX).astype(jnp.int8)

    q_x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -QMAX, QMAX)
    q_x = q_x.astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        q_x, q_w,
        window_strides=_pairs(mod.strides, 2),
        padding=_padding(mod.padding, 2),
        rhs_dilation=_pairs(getattr(mod, "kernel_dilation", 1), 2),
        feature_group_count=mod.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * s_w)  # broadcast over out channels
    if mod.use_bias:
        out = out + jnp.asarray(params["bias"], jnp.float32)
    return out.astype(out_dtype)


def _quantized_dense(mod: nn.Dense, x: jax.Array, s_x) -> jax.Array:
    """int8 matmul for nn.Dense: per-tensor act / per-out-channel weight
    scales, int32 accumulation (the ViT trunk's hot op)."""
    params = mod.variables["params"]
    kernel = jnp.asarray(params["kernel"], jnp.float32)  # (in, out)
    out_dtype = (mod.dtype or jnp.promote_types(x.dtype, params["kernel"].dtype))

    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-8) / QMAX  # (out,)
    q_w = jnp.clip(jnp.round(kernel / s_w), -QMAX, QMAX).astype(jnp.int8)
    q_x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -QMAX, QMAX)
    q_x = q_x.astype(jnp.int8)
    y = jax.lax.dot_general(
        q_x, q_w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * s_w)
    if mod.use_bias:
        out = out + jnp.asarray(params["bias"], jnp.float32)
    return out.astype(out_dtype)


def quantized_apply(
    apply_fn: Callable, act_scales: Dict[str, float]
) -> Callable:
    """Drop-in replacement for `apply_fn`: every conv/dense whose path
    appears in `act_scales` runs int8.  Same signature as apply_fn."""

    def wrapped(variables, *args, **kwargs):
        def interceptor(next_fun, fargs, fkwargs, context):
            if not fargs:  # kwargs-only call: leave untouched
                return next_fun(*fargs, **fkwargs)
            mod, x = context.module, fargs[0]
            if _is_conv_call(context) and _supported(mod, x):
                key = _path_key(mod)
                if key in act_scales:
                    return _quantized_conv(mod, x, act_scales[key])
            elif _is_dense_call(context) and _supported_dense(mod, x):
                key = _path_key(mod)
                if key in act_scales:
                    return _quantized_dense(mod, x, act_scales[key])
            return next_fun(*fargs, **fkwargs)

        with nn.intercept_methods(interceptor):
            return apply_fn(variables, *args, **kwargs)

    return wrapped


def _dynamic_conv(mod: nn.Conv, x: jax.Array) -> jax.Array:
    """int8 conv with the activation scale computed IN-GRAPH from this
    batch (dynamic quantization): no calibration pass, and correct for
    weights that change under the same trace (the EMA teacher)."""
    s_x = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6) / QMAX
    return _quantized_conv(mod, x, s_x)


def quantized_apply_dynamic(apply_fn: Callable) -> Callable:
    """Drop-in apply_fn with EVERY supported conv quantized dynamically:
    per-batch in-graph activation absmax, per-channel weight scales read
    from the live params at trace time.  No calibration state — usable
    inside a training step where the intercepted weights are updated
    every iteration (e.g. the momentum teacher).  Costs one extra
    reduce+requantize pass over each conv input vs the static path."""

    def wrapped(variables, *args, **kwargs):
        def interceptor(next_fun, fargs, fkwargs, context):
            if not fargs or not _is_conv_call(context):
                return next_fun(*fargs, **fkwargs)
            mod, x = context.module, fargs[0]
            if not _supported(mod, x):
                return next_fun(*fargs, **fkwargs)
            return _dynamic_conv(mod, x)

        with nn.intercept_methods(interceptor):
            return apply_fn(variables, *args, **kwargs)

    return wrapped


def quantize_for_serving(
    apply_fn: Callable,
    variables: dict,
    calib_batches: Sequence[jax.Array],
    dense: bool = False,
    n_cls: Optional[int] = None,
    **apply_kwargs,
):
    """One-call PTQ: calibrate then wrap.  Returns (quantized_apply_fn,
    act_scales); pass the former to `core.export.export_classifier`.
    dense=True also quantizes nn.Dense trunk layers (the ViT path) —
    see `calibrate` for the final-logits-Dense exclusion rule."""
    scales = calibrate(apply_fn, variables, calib_batches, dense=dense,
                       n_cls=n_cls, **apply_kwargs)
    return quantized_apply(apply_fn, scales), scales


def teacher_apply_for(teacher_apply: Callable, teacher_quant: str,
                      fused_conflict: bool = False) -> Callable:
    """The training steps' teacher_apply_fn, honoring --teacher_quant.

    Shared validator for the MoMA and comparison-distill paths (they used
    to carry parallel copies): 'int8' wraps every gradient-free teacher
    forward in dynamic-int8 convs; all teacher outputs are
    stop_gradient'ed in the steps, so only KL targets / contrast keys are
    perturbed.  fused_conflict marks the caller's fused_teacher Pallas
    path being active, which bypasses conv interception.
    """
    if teacher_quant == "none":
        return teacher_apply
    if teacher_quant != "int8":
        raise ValueError(f"unknown teacher_quant {teacher_quant!r}")
    if fused_conflict:
        raise ValueError("teacher_quant bypassed by fused_teacher "
                         "(the Pallas path does not intercept convs); "
                         "enable only one")
    return quantized_apply_dynamic(teacher_apply)
