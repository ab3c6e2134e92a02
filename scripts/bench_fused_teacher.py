"""Standalone teacher-forward bench: flax NHWC vs fused Pallas NCHW.

effiB0 @ 512^2, BS64, bf16, train-mode BN (the MoMA momentum-encoder key
forward).  Device-trace timing (wall clock on axon has a ~31 ms RTT
floor).  Run: python scripts/bench_fused_teacher.py [N]
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

enable_compilation_cache()

from moma_tpu.models import create_model
from moma_tpu.ops import fused_effnet as FE
from moma_tpu.ops import fused_effnet_pallas as FEP

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = 10


def device_ms(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out[0]).reshape(-1)[0])
    d = tempfile.mkdtemp(prefix="ftbench_")
    try:
        with trace(d):
            for _ in range(ITERS):
                out = fn(*args)
            jax.block_until_ready(out)
        rows = summarize_trace(d, top=60)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    total = sum(ms for name, ms, _ in rows
                if not (name.startswith("jit_") or name.isdigit()))
    return total / ITERS, rows


def main():
    m = create_model("effiB0", num_classes=4, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 512, 512, 3), jnp.bfloat16),
               train=False)
    params, specs = FE.extract_params(v)
    rng = np.random.RandomState(0)
    x_nhwc = jnp.asarray(rng.randn(N, 512, 512, 3), jnp.bfloat16)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))

    @jax.jit
    def flax_fwd(x):
        (feats, logits), mut = m.apply(v, x, train=True,
                                       mutable=["batch_stats"])
        return feats[-1], logits

    @jax.jit
    def fused_train(x):
        pooled, logits, st = FEP.fused_forward(params, specs, x, train=True)
        return pooled, logits

    @jax.jit
    def fused_eval(x):
        pooled, logits, _ = FEP.fused_forward(params, specs, x, train=False)
        return pooled, logits

    ms, rows = device_ms(flax_fwd, x_nhwc)
    print(f"flax  train fwd: {ms:8.2f} ms/call", flush=True)
    ms2, rows2 = device_ms(fused_train, x_nhwc)
    print(f"fused train fwd: {ms2:8.2f} ms/call", flush=True)
    ms3, _ = device_ms(fused_eval, x_nhwc)
    print(f"fused eval  fwd: {ms3:8.2f} ms/call", flush=True)
    print("\nfused train top ops:")
    for name, t, c in rows2[:30]:
        if name.startswith("jit_") or name.isdigit():
            continue
        print(f"  {t/ITERS:7.2f} ms x{c//ITERS:4d}  {name}")

    # numerical sanity vs flax (bf16 drift tolerated)
    p1, l1 = flax_fwd(x_nhwc[:8])
    p2, l2 = fused_train(x_nhwc[:8])
    rel = float(jnp.abs(p1.astype(jnp.float32) - p2).max()
                / (jnp.abs(p1.astype(jnp.float32)).max() + 1e-6))
    print(f"\npooled rel err vs flax (bf16): {rel:.3g}")


if __name__ == "__main__":
    main()
