"""Tune the key-padded flash route at big N and pin kernel floors.

VERDICT r3 weak #2 / next #4: the round-3 block sweep ran at N=16640
only; at N=65792/131328 it noted "only 128/256 divide without padding"
— but the key-padding+masking route built after that sweep lifts the
restriction (any block_k, padded tail masked in-kernel), and the
scaled-K rows (234/89 img/s) shipped untuned.  This probe, on the real
chip:

  (a) times the Pallas FORWARD and the full GRADIENT (two-kernel Pallas
      backward) across candidate (block_q, bk_fwd, bk_bwd, npad) tuples
      — exact divisors AND padded variants — by monkeypatching
      ops.flash_attention.pick_blocks so the whole custom-VJP route runs
      each candidate unmodified;
  (b) prints the ANALYTIC floors next to each measurement — the one op
      family without one (VERDICT r3 weak #6):
        compute floor = 4*H*N*Nk*d / 197e12  (two MXU matmuls fwd;
                        backward ~2.5x: 5 matmuls of the same shape)
        HBM floor     = k/v streamed once per q-block (the kernel's
                        actual schedule) + q/o/stats once, / 819e9
      so "intrinsic cost" becomes a checked claim, not an assumption.

Timing: overlapped chain with one final value fetch (CLAUDE.md — the
only trustworthy wallclock on the axon relay).  H=4, d=128, bf16: the
exact CMO 'all'-mode shapes (moma/cmo.py).

  python scripts/tune_flash_bigN.py [--ns 65792,131328] [--iters 8] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_HBM = 819e9


def floors_ms(N, Nk, bq, H=4, d=128):
    """(fwd_compute, fwd_hbm, grad_compute, grad_hbm) in ms."""
    fwd_flops = 4 * H * N * Nk * d            # QK^T + PV
    # backward: s, dp (N,Nk) matmuls + dv, dk, dq contractions = 5 of
    # the forward's 2; plus the dq kernel re-streams k/v per q-block and
    # the dkv kernel re-streams q/do per k-block.
    bwd_flops = 10 * H * N * Nk * d
    fwd_traffic = (H * (N // bq) * Nk * d * 2 * 2      # k+v per q-block
                   + H * N * d * 2 * 2)                # q read, o write
    bwd_traffic = (H * (N // bq) * Nk * d * 2 * 2      # dq kernel: k+v
                   + H * (Nk // bq) * N * d * 2 * 3    # dkv kernel: q,do re-streamed (+m/l/delta small)
                   + H * (N + 2 * Nk) * d * 4)         # dq/dk/dv f32 out
    return (fwd_flops / V5E_BF16_FLOPS * 1e3,
            fwd_traffic / V5E_HBM * 1e3,
            (fwd_flops + bwd_flops) / V5E_BF16_FLOPS * 1e3,
            (fwd_traffic + bwd_traffic) / V5E_HBM * 1e3)


def _chain_time(fn, x0, iters):
    o = fn(x0)
    o.block_until_ready()  # compile outside the clock
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(o)
    final = float(np.asarray(o).ravel()[0])  # forces the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    return dt / iters * 1e3


def candidates(N):
    """Candidate (bq, bk_f, bk_b, npad) tuples: the picker's choice plus
    padded power-of-two and band-edge variants."""
    import moma_tpu.ops.flash_attention as fa

    cands = [fa.pick_blocks(N)]
    for bk_f, bk_b in ((4096, 2048), (4608, 2304), (3072, 1536),
                       (2048, 2048), (4096, 1024)):
        lcm = np.lcm(np.lcm(bk_f, bk_b), 256)
        npad = int(-(-N // lcm) * lcm)
        t = (256, bk_f, bk_b, npad)
        if t not in cands:
            cands.append(t)
    # r3-legacy exact divisors that violate the bf16 (16,128) min-tile
    # 16-multiple rule (4104 % 16 == 8): included to measure whether
    # Mosaic accepts them anyway — r3's N=131328 shipped bk=4104 and
    # benched 89.1 img/s in-step, so either it ran or its fallback did
    for bk in (4104, 2052, 4104 // 2 * 4):  # 4104, 2052, 8208
        if N % bk == 0:
            t = (256, bk, bk, N)
            if t not in cands:
                cands.append(t)
    return cands


def measure(N, iters, H=4, d=128):
    import jax
    import jax.numpy as jnp

    import moma_tpu.ops.flash_attention as fa

    rs = np.random.RandomState(0)
    k = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    q0 = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
    scale = d ** -0.5
    rows = []
    orig = fa.pick_blocks
    try:
        for bq, bk_f, bk_b, npad in candidates(N):
            fa.pick_blocks = lambda n, _t=(bq, bk_f, bk_b, npad): _t
            fc, fh, gc, gh = floors_ms(N, npad, bq, H, d)
            row = {"bq": bq, "bk_f": bk_f, "bk_b": bk_b, "npad": npad,
                   "floor_fwd_ms": round(max(fc, fh), 2),
                   "floor_grad_ms": round(max(gc, gh), 2)}
            try:
                # k/v as ARGUMENTS, not jit closures: closure constants
                # ride the remote-compile request body and blow its size
                # limit at big N (HTTP 413 — CLAUDE.md session-19)
                fwd_kv = jax.jit(lambda x, kk, vv: fa.streaming_attention(
                    x, kk, vv, scale, True))
                row["fwd_ms"] = round(_chain_time(
                    lambda x: fwd_kv(x, k, v), q0, iters), 2)

                def loss(x, kk, vv):
                    return jnp.sum(fa.streaming_attention(
                        x, kk, vv, scale, True).astype(jnp.float32) ** 2)
                g_kv = jax.jit(lambda x, kk, vv: jax.grad(loss)(
                    x, kk, vv).astype(jnp.bfloat16))
                row["grad_ms"] = round(_chain_time(
                    lambda x: g_kv(x, k, v), q0, max(iters // 2, 4)), 2)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"  N={N} {row}", flush=True)
            rows.append(row)
    finally:
        fa.pick_blocks = orig
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ns", type=str, default="16640,65792,131328")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    out = {}
    for N in (int(s) for s in a.ns.split(",")):
        print(f"[tune_flash_bigN] N={N}", flush=True)
        out[f"N{N}"] = measure(N, a.iters)
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
