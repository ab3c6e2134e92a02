"""bf16-dots vs f32-dots flash BACKWARD: speed + numerics on chip.

The round-3 Pallas flash backward shipped with f32 in-kernel dots
(exactness first: rel-L2 2-4e-4 vs the chunked oracle).  Standard flash
practice keeps the MXU operands bf16 with f32 accumulation — up to 4x
the dot rate on v5e.  This probe times both modes (overlapped chains,
value-forced) and measures their dq/dk/dv rel-L2 against each other, at
the shipped MoCoAtt token counts.

  timeout 1800 python scripts/probe_bwd_bf16.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from moma_tpu.core.cache import enable_compilation_cache
    from moma_tpu.ops.flash_attention import (_flash_backward,
                                              _flash_forward, pick_blocks)

    enable_compilation_cache()
    out = {}
    for N in (16640, 65792):
        H, d = 4, 128
        bq, bk_f, bk_b, npad = pick_blocks(N)
        assert npad == N, "probe assumes divisor route"
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
        scale = d ** -0.5
        o, m, l = jax.jit(
            lambda q, k, v: _flash_forward(q, k, v, scale, bq, bk_f)
        )(q, k, v)
        jax.block_until_ready(o)

        grads = {}
        g0 = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)  # SHARED cotangent
        for mode in (False, True):
            # arrays as ARGUMENTS: closures bake them into the compiled
            # program as constants and blow the remote-compile request
            # size limit at big N (HTTP 413, measured at N=65792)
            fn = jax.jit(lambda q, k, v, o, m, l, g, _m=mode: _flash_backward(
                q, k, v, o, m, l, g, scale, bq, bk_b, bf16_dots=_m))
            fn = functools.partial(fn, q, k, v, o, m, l)
            dq, dk, dv = fn(g0)
            jax.block_until_ready((dq, dk, dv))
            grads[mode] = tuple(np.asarray(x, np.float32)
                                for x in (dq, dk, dv))
            iters = 20 if N < 30000 else 6
            gi = g0
            t0 = time.perf_counter()
            for _ in range(iters):
                dq, dk, dv = fn(gi)
                gi = dq.astype(jnp.bfloat16)  # chain
            float(gi[0, 0, 0].astype(np.float32))
            key = f"N{N}_" + ("bf16" if mode else "f32")
            out[key + "_ms"] = round(
                (time.perf_counter() - t0) / iters * 1e3, 2)
            print(key, out[key + "_ms"], "ms", flush=True)
        rel = [float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))
               for a, b in zip(grads[True], grads[False])]
        out[f"N{N}_rel_l2_bf16_vs_f32"] = [round(r, 6) for r in rel]
        print(f"N{N} rel-L2 dq/dk/dv:", rel, flush=True)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
