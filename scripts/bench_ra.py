"""RandAugment layer micro-bench on real TPU.

Times ra_layer_pallas (the fused VMEM kernel, stages 2-4) plus the
XLA-staged LUT stage at the training shape (B,3,512,512).  Timing uses
the overlapped method from CLAUDE.md: chain N dependent layer calls,
fetch ONE final scalar (a fetched value cannot be faked), divide by N.
Inputs are device-resident (the axon relay uploads at ~25 MB/s — a
fresh device_put per call would measure the tunnel).

Usage: python scripts/bench_ra.py [B=128] [N=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from moma_tpu.core.cache import enable_compilation_cache


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    enable_compilation_cache()

    from moma_tpu.data.randaugment import randaugment_layer
    from moma_tpu.ops.pallas_randaugment import ra_layer_pallas

    fill = (128.0, 128.0, 128.0)

    @jax.jit
    def chain_pallas(x, rng):
        def body(c, k):
            return ra_layer_pallas(c, k, 9.0, 0.5, fill), 0.0
        x, _ = jax.lax.scan(body, x, jax.random.split(rng, N))
        return jnp.sum(x[0, 0, :8, :8])

    @jax.jit
    def chain_xla(x, rng):
        def body(c, k):
            return jnp.round(
                randaugment_layer(c, k, 9.0, 0.5, fill)), 0.0
        x, _ = jax.lax.scan(body, x, jax.random.split(rng, N))
        return jnp.sum(x[0, 0, :8, :8])

    key = jax.random.PRNGKey(0)
    x = jax.device_put(
        jnp.round(jax.random.uniform(key, (B, 3, 512, 512)) * 255.0))
    x.block_until_ready()

    for name, fn in (("pallas", chain_pallas), ("xla-staged", chain_xla)):
        v = float(fn(x, key))  # compile + warm
        t0 = time.perf_counter()
        v = float(fn(x, jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        print(f"{name:>10}: {dt / N * 1000:7.2f} ms/layer  B={B} "
              f"(chain of {N}, final={v:.1f})")


if __name__ == "__main__":
    main()
