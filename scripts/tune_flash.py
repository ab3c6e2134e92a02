"""Tune the flash-attention kernel's block sizes at MoCoAtt token counts.

Round-2 left the Pallas flash forward at block_q=256 and block_k picked
only for divisibility (512 if N%512==0 else 256) — never tuned for
speed (VERDICT weak #6).  This probe times, on the real chip:

  (a) the Pallas FORWARD across every (block_q, block_k) pair that
      divides N, for N = 2B+K at the shipped configs
      (BS128 K=16384 -> 16640 tokens; K=65536 -> 65792; K=131072 ->
      131328), H=4 heads, d=128 (feat_dim 512 / 4), bf16 — the exact
      shapes the CMO 'all'-mode attention runs (moma/cmo.py);
  (b) the streaming BACKWARD's scan chunk size (the backward is the
      XLA chunked scan of ops/flash_attention.py:_streaming_attention_bwd
      for every forward route).

Timing: overlapped chain (o_{i+1} = attn(o_i, k, v)) with one final
value fetch — the only trustworthy wallclock method on the axon relay
(CLAUDE.md).  Rankings feed the block-selection heuristic in
ops/flash_attention.py; the winner is then re-measured IN-STEP via
bench.bench_moma_histo(mem='MoCoAtt', attn='all').

  python scripts/tune_flash.py [--iters 20] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chain_time(fn, x0, iters):
    import jax

    o = fn(x0)
    o.block_until_ready()  # compile outside the clock
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(o)
    final = float(o[0, 0, 0].astype(np.float32))  # forces the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return dt / iters * 1e3  # ms/call


def tune_forward(N, H=4, d=128, iters=20, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from moma_tpu.ops.flash_attention import flash_attention

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    k = jnp.asarray(rs.randn(H, N, d), dt)
    v = jnp.asarray(rs.randn(H, N, d), dt)
    q0 = jnp.asarray(rs.randn(H, N, d), dt)
    scale = d ** -0.5

    cand = [128, 256, 512, 640, 1024, 1280, 2048, 2080, 4160]
    rows = {}
    for bq in cand:
        if N % bq:
            continue
        for bk in cand:
            if N % bk:
                continue
            try:
                fn = jax.jit(lambda x, _bq=bq, _bk=bk: flash_attention(
                    x, k, v, scale, block_q=_bq, block_k=_bk))
                ms = _chain_time(fn, q0, iters)
                rows[f"bq{bq}_bk{bk}"] = round(ms, 3)
                print(f"  N={N} bq={bq} bk={bk}: {ms:.3f} ms", flush=True)
            except Exception as e:
                rows[f"bq{bq}_bk{bk}"] = f"FAILED {type(e).__name__}"
                print(f"  N={N} bq={bq} bk={bk}: FAILED {e}", flush=True)
    return rows


def tune_backward(N, H=4, d=128, iters=10):
    """Chunk-size sweep for the streaming-scan backward (grad wrt q)."""
    import jax
    import jax.numpy as jnp

    from moma_tpu.ops.flash_attention import streaming_attention

    rs = np.random.RandomState(0)
    k = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    q0 = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    scale = d ** -0.5

    rows = {}
    for chunk in (512, 1024, 2048, 4096, 8192):
        if chunk > N:
            continue
        def loss(q, _c=chunk):
            return jnp.sum(
                streaming_attention(q, k, v, scale, True, _c)
                .astype(jnp.float32) ** 2)
        try:
            g = jax.jit(jax.grad(loss))
            ms = _chain_time(lambda x: g(x).astype(jnp.bfloat16), q0, iters)
            rows[f"chunk{chunk}"] = round(ms, 3)
            print(f"  N={N} bwd chunk={chunk}: {ms:.3f} ms", flush=True)
        except Exception as e:
            rows[f"chunk{chunk}"] = f"FAILED {type(e).__name__}"
            print(f"  N={N} bwd chunk={chunk}: FAILED {e}", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ns", type=str, default="16640,65792,131328")
    p.add_argument("--skip_bwd", action="store_true")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    out = {}
    for N in (int(s) for s in a.ns.split(",")):
        print(f"[tune_flash] forward N={N}", flush=True)
        out[f"fwd_N{N}"] = tune_forward(N, iters=a.iters)
        if not a.skip_bwd:
            print(f"[tune_flash] backward N={N}", flush=True)
            out[f"bwd_N{N}"] = tune_backward(N, iters=max(a.iters // 2, 5))
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
