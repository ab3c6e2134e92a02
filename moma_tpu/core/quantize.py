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

`weight_only_for_serving` (`--int8_weights`) is the third mode: kernels
are quantized per-output-channel to int8 ON THE HOST and baked into the
artifact as int8 constants (the f32 originals are DCE'd at trace); the
graph dequantizes them behind a lax.optimization_barrier (which stops
XLA constant-folding the dequant back to a full-width kernel) and
computes in the activation dtype.  No activation rounding, no
calibration, ~4x smaller weight constants — the right mode when full
int8's per-layer activation quantize streams cost more HBM than the
int8 dots save (measured for conv nets: BASELINE.md "Serving floor
analysis").
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


def _logits_dense_key(order: list, dense: bool, n_cls: Optional[int]):
    """The module path the final-logits exclusion rule keeps fp: the LAST
    intercepted call is a Dense and (when n_cls is given) its width is
    n_cls.  Shared by calibrate and collect_quantizable — ALL calls of
    that module stay fp, including earlier ones of a tied/shared layer."""
    if dense and order:
        last_key, last_kind, last_feat = order[-1]
        if last_kind == "dense" and (n_cls is None or last_feat == n_cls):
            return last_key
    return None


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
    excl = _logits_dense_key(order, dense, n_cls)
    if excl is not None:
        amax.pop(excl, None)  # the logits layer stays fp
    return {k: max(v, 1e-6) / QMAX for k, v in amax.items()}


def _kernel_int8(kernel, xp):
    """Per-output-channel int8 kernel quantization — THE one copy of the
    scale/round recipe, shared by the in-graph int8 paths (xp=jnp) and
    the host-side weights-only bake (xp=np: axon dispatches every jnp op
    through the relay, so artifact baking must stay off-device).
    Returns (q_w int8, s_w f32 of shape (out,))."""
    s_w = xp.max(xp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    s_w = xp.maximum(s_w, 1e-8) / QMAX  # (out,)
    q_w = xp.clip(xp.round(kernel / s_w), -QMAX, QMAX).astype(xp.int8)
    return q_w, s_w


def _quantized_conv(mod: nn.Conv, x: jax.Array, s_x: float) -> jax.Array:
    params = mod.variables["params"]
    kernel = jnp.asarray(params["kernel"], jnp.float32)  # (kh, kw, in/g, out)
    out_dtype = (mod.dtype or jnp.promote_types(x.dtype, params["kernel"].dtype))

    q_w, s_w = _kernel_int8(kernel, jnp)

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

    q_w, s_w = _kernel_int8(kernel, jnp)
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


def collect_quantizable(
    apply_fn: Callable,
    variables: dict,
    sample: jax.Array,
    dense: bool = False,
    n_cls: Optional[int] = None,
    **apply_kwargs,
) -> list:
    """Enumerate the quantizable conv/dense layers of one forward.

    Runs the forward under `jax.eval_shape` (no FLOPs, host-only) with the
    recording interceptor and returns [(module_path, kind)] in call order,
    minus the final-logits Dense (same exclusion rule as `calibrate`).
    """
    order: list = []

    def run(v, x):
        stats: Dict[str, jax.Array] = {}
        with nn.intercept_methods(
                calibration_interceptor(stats, dense=dense, order=order)):
            apply_fn(v, x, **apply_kwargs)
        return 0

    jax.eval_shape(run, variables, sample)
    excl = _logits_dense_key(order, dense, n_cls)
    seen, layers = set(), []
    for key, kind, _ in order:
        if key != excl and key not in seen:
            seen.add(key)
            layers.append((key, kind))
    return layers


def _params_node(variables: dict, key: str) -> dict:
    node = variables["params"]
    if key:  # "" = the applied module IS the conv/dense (no submodules)
        for part in key.split("/"):
            node = node[part]
    return node


def quantize_weights(variables: dict, layers: Sequence) -> dict:
    """Host-side (numpy) per-output-channel int8 quantization of the
    kernels named by `layers`.  Returns {path: (q_w int8, s_w f32)} —
    these become the ONLY kernel constants the weight-only graph closes
    over (the f32 originals are dead-code-eliminated at trace)."""
    import numpy as _np

    qw: dict = {}
    for key, _kind in layers:
        kern = _np.asarray(_params_node(variables, key)["kernel"],
                           _np.float32)
        q, s = _kernel_int8(kern, _np)
        qw[key] = (q, s.astype(_np.float32))
    return qw


def _weight_only_call(mod, x: jax.Array, q, s) -> jax.Array:
    """conv/dense with an int8 kernel dequantized in-graph: the artifact
    stores q_w (int8, 4x smaller than f32) and the runtime streams int8
    weight bytes from HBM; compute stays in the activation dtype (bf16
    under --bf16) at the full MXU rate.  The optimization_barrier blocks
    XLA from constant-folding `q * s` back into a full-width kernel."""
    cdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    q_const = jax.lax.optimization_barrier(jnp.asarray(q))
    # dequantize in f32 THEN cast: rounding the (f32) per-channel scale
    # itself to bf16 first would bias every weight of a channel by the
    # same factor (up to ~0.2%) — a systematic error that, unlike
    # per-weight bf16 rounding, does not average out over fan-in
    w = (q_const.astype(jnp.float32)
         * jnp.asarray(s, jnp.float32)).astype(cdt)
    params = mod.variables["params"]
    if isinstance(mod, nn.Conv):
        y = jax.lax.conv_general_dilated(
            x.astype(cdt), w,
            window_strides=_pairs(mod.strides, 2),
            padding=_padding(mod.padding, 2),
            rhs_dilation=_pairs(getattr(mod, "kernel_dilation", 1), 2),
            feature_group_count=mod.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = jax.lax.dot_general(
            x.astype(cdt), w, (((x.ndim - 1,), (0,)), ((), ())))
    if mod.use_bias:
        y = y + jnp.asarray(params["bias"], cdt)
    # same dtype=None fallback as flax / _quantized_conv (reading the f32
    # kernel's .dtype is metadata only — it does not resurrect the DCE'd
    # constant in the traced graph)
    out_dtype = (mod.dtype
                 or jnp.promote_types(x.dtype, params["kernel"].dtype))
    return y.astype(out_dtype)


def weight_only_apply(apply_fn: Callable, qw: dict) -> Callable:
    """Drop-in apply_fn where every layer in `qw` runs with an int8
    weight dequantized in-graph (weights-only quantization: activations
    and accumulation untouched — none of the per-layer activation
    quantize/dequantize streams that made full int8 LOSE to bf16 on the
    device trace, BASELINE.md "Serving floor analysis")."""

    def wrapped(variables, *args, **kwargs):
        def interceptor(next_fun, fargs, fkwargs, context):
            if not fargs:
                return next_fun(*fargs, **fkwargs)
            mod, x = context.module, fargs[0]
            if ((_is_conv_call(context) and _supported(mod, x))
                    or (_is_dense_call(context)
                        and _supported_dense(mod, x))):
                key = _path_key(mod)
                if key in qw:
                    return _weight_only_call(mod, x, *qw[key])
            return next_fun(*fargs, **fkwargs)

        with nn.intercept_methods(interceptor):
            return apply_fn(variables, *args, **kwargs)

    return wrapped


def weight_only_for_serving(
    apply_fn: Callable,
    variables: dict,
    sample: jax.Array,
    dense: bool = True,
    n_cls: Optional[int] = None,
    **apply_kwargs,
):
    """One-call weights-only int8: enumerate (eval_shape, no device work),
    quantize kernels on host, wrap.  No calibration pass — weight ranges
    are known exactly.  Returns (wrapped_apply_fn, n_layers)."""
    layers = collect_quantizable(apply_fn, variables, sample, dense=dense,
                                 n_cls=n_cls, **apply_kwargs)
    qw = quantize_weights(variables, layers)
    return weight_only_apply(apply_fn, qw), len(qw)


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
