"""Microbench: BN channel reductions on TPU — XLA vs lane-packed Pallas.

Quantifies the round-1 trace finding (BASELINE.md: 56% of the MoMA step is
BN batch-stats convert_reduce fusions) and validates the fused_bn fix.

Wall-clock on the axon relay has a ~31 ms RTT floor that drowns
individual ops, so each variant runs ITERS times under a device trace and
we report aggregated DEVICE time per op family (core/profiling.py).

Run: python scripts/bench_bn.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.cache import enable_compilation_cache
from moma_tpu.core.profiling import summarize_trace, trace
from moma_tpu.ops import fused_bn as FB

enable_compilation_cache()

print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)

ITERS = 20


def device_ms(fn, *args):
    """Total device-lane ms for ITERS calls (compile + warmup excluded)."""
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0])
    d = tempfile.mkdtemp(prefix="bnbench_")
    try:
        with trace(d):
            for _ in range(ITERS):
                out = fn(*args)
            jax.block_until_ready(out)
            _ = float(jnp.asarray(out).reshape(-1)[0])
        rows = summarize_trace(d, top=40)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    total = sum(ms for _, ms, _ in rows)
    return total / ITERS, rows


def main():
    from flax import linen as nn

    rng = np.random.RandomState(0)
    for shape in [(64, 256, 256, 32), (64, 256, 256, 96), (64, 128, 128, 144)]:
        C = shape[-1]
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        dy = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        gb = x.size * 2 / 1e9

        @jax.jit
        def xla_sums(x):
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            return jnp.sum(xf, axes) + jnp.sum(xf * xf, axes)

        FB.set_fused_bn("on")
        pallas_sums = jax.jit(lambda x: FB.channel_sums(x)[0])
        pallas_gsums = jax.jit(
            lambda dy, x: FB.grad_channel_sums(dy, x, jnp.zeros(C))[0]
        )

        bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                          epsilon=1e-3, dtype=jnp.bfloat16)
        bs0 = {"mean": jnp.zeros(C), "var": jnp.ones(C)}

        @jax.jit
        def flax_fb(x, s, b):
            def loss(x, s, b):
                v = {"params": {"scale": s, "bias": b}, "batch_stats": bs0}
                y, _ = bn.apply(v, x, mutable=["batch_stats"])
                yf = y.astype(jnp.float32)
                return jnp.sum(yf * yf)
            return jax.grad(loss)(x, s, b).reshape(-1)[:1].astype(jnp.float32)

        @jax.jit
        def fused_fb(x, s, b):
            def loss(x, s, b):
                y, _, _ = FB.fused_bn_train(x, s, b, 1e-3, jnp.bfloat16)
                yf = y.astype(jnp.float32)
                return jnp.sum(yf * yf)
            return jax.grad(loss)(x, s, b).reshape(-1)[:1].astype(jnp.float32)

        res = {}
        res["xla_sums"], _ = device_ms(xla_sums, x)
        res["pallas_sums"], _ = device_ms(pallas_sums, x)
        res["pallas_gsums"], _ = device_ms(pallas_gsums, dy, x)
        res["flax_fwd_bwd"], rows_flax = device_ms(flax_fb, x, scale, bias)
        res["fused_fwd_bwd"], rows_fused = device_ms(fused_fb, x, scale, bias)
        FB.set_fused_bn("auto")

        bw = lambda ms: gb / (ms / 1e3) if ms > 0 else float("inf")
        print(f"\n{shape}  ({gb:.2f} GB/read)")
        for k, v in res.items():
            reads = {"xla_sums": 1, "pallas_sums": 1, "pallas_gsums": 2,
                     "flax_fwd_bwd": 6, "fused_fwd_bwd": 6}[k]
            print(f"  {k:14s} {v:8.3f} ms/call  "
                  f"~{bw(v)*reads/ (1 if reads else 1):6.0f} GB/s eff", flush=True)
        print("  flax fwd+bwd families:",
              [(n, round(ms / ITERS, 2)) for n, ms, _ in rows_flax[:6]])
        print("  fused fwd+bwd families:",
              [(n, round(ms / ITERS, 2)) for n, ms, _ in rows_fused[:6]],
              flush=True)


if __name__ == "__main__":
    main()
