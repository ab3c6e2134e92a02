"""Resumable one-session runner for the queued TPU measurements.

The axon relay can go down for hours mid-session (it ate the tail of two
sessions already), so every TPU measurement queued behind an outage is
registered here as a named item whose result is flushed to disk the
moment it lands.  Re-running the script skips everything already
recorded — a relay death mid-run costs only the in-flight item.

Items (in order; each independently skippable with --only/--skip):
  moma_bs128            headline re-confirm (reference-faithful config)
  moma_bs128_tq         --teacher_quant int8 side-bench (dynamic-int8
                        gradient-free teacher forwards; BASELINE.md has
                        the accuracy study, throughput was pending)
  moma_bs256            batch-scaling side point (non-faithful; catches
                        OOM gracefully)
  moma_bs256_remat      BS256 with student-forward remat — runs only if
                        plain BS256 OOMed
  serving_effib0        f32/bf16/int8/int8_dynamic/int8+bf16 exported
                        effiB0@512 serving throughput
  serving_vit           same for vit_tiny_patch16_224 @224 (dense-trunk
                        int8 path)

Results land in .bench/tpu_pending.json (untracked); transfer the
numbers to BASELINE.md by hand.  Run it with an outer `timeout` — relay
outages HANG rather than raise:  timeout 3600 python scripts/tpu_pending.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".bench", "tpu_pending.json")


def _load() -> dict:
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def _flush(results: dict) -> None:
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    os.replace(tmp, RESULTS)


def item_moma_bs128():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(batch_size=128), 1)}


def item_moma_bs128_tq():
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=128, teacher_quant="int8"), 1)}


def item_moma_bs256():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(batch_size=256), 1)}


def item_moma_bs256_remat():
    """Only interesting if plain BS256 OOMs — remat trades FLOPs for the
    held student activations.  Skipped automatically when bs256 passed."""
    import bench

    prev = _load().get("moma_bs256")
    if prev and prev.get("ok"):
        return {"skipped": "moma_bs256 fit without remat"}
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=256, remat=True), 1)}


def item_serving_effib0():
    from bench_serving import main as serving_main
    return serving_main(["--model", "effiB0", "--image_size", "512",
                         "--bs", "128",
                         "--modes", "f32,bf16,int8,int8_dynamic,int8_bf16"])


def item_serving_vit():
    from bench_serving import main as serving_main
    return serving_main(["--model", "vit_tiny_patch16_224",
                         "--image_size", "224", "--bs", "256",
                         "--modes", "f32,bf16,int8,int8_dynamic"])


def item_moma_bs512():
    """Does the faithful config fit at BS512@512px on one v5e chip?
    (expected OOM — the point of the grad-accum comparison below)."""
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=512, steps=10, warmup=3), 1)}


def item_moma_bs512_accum4():
    """The memory lever doing its job: effective batch 512 as 4 virtual
    DDP ranks of 128 (train/moma.py _make_moma_accum_step) — one
    microbatch's activations held at a time."""
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=512, grad_accum=4,
                               steps=10, warmup=3), 1)}


def item_moma_k65536():
    """Queue scaling on one chip: K=65536 (4x the reference's 16384)."""
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=128, nce_k=65536), 1)}


def item_moma_k262144():
    """K=262144 (16x): the 512 MB f32 bank + (B, K) logits still fit —
    the region where the reference's per-GPU replicated bank + dense
    attention design has long since died."""
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=128, nce_k=262144,
                               steps=10, warmup=3), 1)}


def item_attn_grad_pallas():
    """Correctness: jax.grad through the PALLAS flash forward on the real
    chip (streaming_attention custom VJP).  Before the fix this path
    raised at trace time — MoCoAtt attn='all' training was unrunnable on
    TPU at any K > 2048."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moma_tpu.ops.flash_attention import streaming_attention

    H, N, d = 4, 2560, 128
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
    w = jnp.asarray(rs.randn(H, N, d).astype(np.float32))

    def make_loss(use_pallas):
        def loss(q, k, v):
            return jnp.sum(
                streaming_attention(q, k, v, d**-0.5, use_pallas) * w)
        return loss

    gp = jax.jit(jax.grad(make_loss(True), argnums=(0, 1, 2)))(q, k, v)
    gc = jax.jit(jax.grad(make_loss(False), argnums=(0, 1, 2)))(q, k, v)
    rel = [float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9))
           for a, b in zip(gp, gc)]
    assert all(r < 1e-4 for r in rel), rel
    return {"rel_l2_dq_dk_dv": [round(r, 8) for r in rel]}


def item_moma_attn_all():
    """Throughput of the newly-runnable config: MoCoAtt attn='all' over
    2B+K = 16640 tokens (flash fwd + streaming-scan bwd), BS128."""
    import bench
    return {"img_per_s_chip": round(
        bench.bench_moma_histo(batch_size=128, mem="MoCoAtt", attn="all"), 1)}


def item_r3_kl_exact_full():
    """kl_teacher_bn='exact' real cost at the flagship size: the extra
    eval-BN-KL program's compile wall-clock (cold + persistent-cache
    warm) on the real chip.  Steady-state cost is ZERO by HLO identity
    (scripts/kl_exact_cost.py part 1, CPU-provable)."""
    from kl_exact_cost import main as kl_main
    return kl_main(["--platform", "tpu", "--full_size"])


def item_r3_bf16_convergence():
    """Converged top-1 of the SHIPPED bf16 default vs f32, on the real
    chip, with the f32 chaos floor alongside (VERDICT missing #1)."""
    from bf16_accuracy import main as bf_main
    return bf_main(["--platform", "tpu"])


def item_r3_flash_tune_16640():
    from tune_flash import main as tf_main
    return tf_main(["--ns", "16640"])


def item_r3_flash_tune_65792():
    from tune_flash import main as tf_main
    return tf_main(["--ns", "65792"])


def item_r3_flash_tune_131328():
    from tune_flash import main as tf_main
    return tf_main(["--ns", "131328"])


def item_r3_attn_all_k65536():
    """SURVEY §5's scaled-K promise: MoCoAtt attn='all' TRAINING over
    2B+K = 65792 tokens (4x the reference's ceiling-by-design)."""
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=65536,
        steps=10, warmup=3), 1)}


def item_r3_attn_all_k131072():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=131072,
        steps=10, warmup=3), 1)}


def item_r3b_attn_grad_pallas():
    """Grad parity of the NEW Pallas flash backward vs the chunked-scan
    route on chip — the two routes no longer share a backward, so this
    is a real numerical check (f32 in-kernel dots)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moma_tpu.ops.flash_attention import streaming_attention

    out = {}
    for N in (2560, 16640):
        H, d = 4, 128
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
        k = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
        v = jnp.asarray(rs.randn(H, N, d).astype(np.float32))
        w = jnp.asarray(rs.randn(H, N, d).astype(np.float32))

        def make_loss(use_pallas):
            def loss(q, k, v):
                return jnp.sum(
                    streaming_attention(q, k, v, d**-0.5, use_pallas) * w)
            return loss

        gp = jax.jit(jax.grad(make_loss(True), argnums=(0, 1, 2)))(q, k, v)
        gc = jax.jit(jax.grad(make_loss(False), argnums=(0, 1, 2)))(q, k, v)
        rel = [float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9))
               for a, b in zip(gp, gc)]
        assert all(r < 5e-4 for r in rel), (N, rel)
        out[f"N{N}_rel_l2_dq_dk_dv"] = [round(r, 8) for r in rel]
    return out


def item_r3b_flash_times():
    """Wallclock of the tuned fwd and the NEW Pallas bwd vs round-2's
    XLA-scan bwd, overlapped chains (was: fwd 16.4 ms @(256,256), bwd
    ~50 ms at N=16640)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from moma_tpu.ops.flash_attention import pick_blocks, streaming_attention

    out = {"blocks": {}}
    for N in (16640, 65792):
        H, d = 4, 128
        out["blocks"][str(N)] = pick_blocks(N)
        rs = np.random.RandomState(0)
        k = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)
        q0 = jnp.asarray(rs.randn(H, N, d), jnp.bfloat16)

        fwd = jax.jit(lambda x: streaming_attention(x, k, v, d**-0.5, True))
        o = fwd(q0); o.block_until_ready()
        iters = 20 if N < 30000 else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fwd(o)
        float(o[0, 0, 0].astype(np.float32))
        out[f"fwd_N{N}_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

        def loss(x):
            return jnp.sum(streaming_attention(
                x, k, v, d**-0.5, True).astype(jnp.float32) ** 2)
        g = jax.jit(lambda x: jax.grad(loss)(x).astype(jnp.bfloat16))
        o = g(q0); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            o = g(o)
        float(o[0, 0, 0].astype(np.float32))
        out[f"grad_N{N}_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    return out


def item_r3b_attn_all_bs128():
    """MoCoAtt attn='all' re-bench with the tuned fwd + Pallas bwd
    (round-2: 412.2 img/s/chip)."""
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all"), 1)}


def item_r3b_attn_all_k65536():
    """(was 97.0 with the XLA-scan backward)"""
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=65536,
        steps=10, warmup=3), 1)}


def item_r3b_attn_all_k131072():
    """(was 28.5 with the XLA-scan backward)"""
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=131072,
        steps=6, warmup=2), 1)}


def item_r3b_kl_exact_cost_full():
    """Fresh-process HLO identity + cold/warm compile cost at full size
    (the in-process version measured trace-counter artifacts)."""
    from kl_exact_cost import main as kl_main
    return kl_main(["--platform", "tpu", "--full_size"])


def item_r4_flagship_bf16():
    """Flagship-scale convergence: the SHIPPED bf16 default at the
    canonical config (effiB0@512, global BS128, K=16384, mlp/self,
    full RA, exact-BN) — VERDICT r3 next #1."""
    from flagship_accuracy import main as fa_main
    return fa_main(["--runs", "bf16", "--epochs", "20",
                    "--pretrain_epochs", "24",
                    "--json", "/tmp/flagship_bf16.json"])


def item_r4_flagship_f32():
    from flagship_accuracy import main as fa_main
    return fa_main(["--runs", "f32", "--epochs", "20",
                    "--pretrain_epochs", "24",
                    "--json", "/tmp/flagship_f32.json"])


def item_r4_flagship_chaos():
    from flagship_accuracy import main as fa_main
    return fa_main(["--runs", "chaos", "--epochs", "20",
                    "--pretrain_epochs", "24",
                    "--json", "/tmp/flagship_chaos.json"])


def item_r4_flash_bigN_65792():
    """Tuned key-padded flash blocks at N=65792 + analytic floors
    (VERDICT r3 next #4)."""
    from tune_flash_bigN import main as tf_main
    return tf_main(["--ns", "65792", "--iters", "6"])


def item_r4_flash_bigN_131328():
    from tune_flash_bigN import main as tf_main
    return tf_main(["--ns", "131328", "--iters", "4"])


def item_r4_flash_bigN_16640():
    """Floor check for the headline-adjacent N (the one tuned in r3)."""
    from tune_flash_bigN import main as tf_main
    return tf_main(["--ns", "16640", "--iters", "10"])


def item_r4_attn_all_k65536():
    """Re-bench the scaled-K rows after the x16/min-pad picker redesign
    (r3 rows to supersede: 234.5 / 89.1)."""
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=65536,
        steps=10, warmup=3), 1)}


def item_r4_attn_all_k131072():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all", nce_k=131072,
        steps=6, warmup=2), 1)}


def item_r4_attn_all_bs128():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(
        batch_size=128, mem="MoCoAtt", attn="all"), 1)}


def item_r4_stem_s2d():
    """Space-to-depth folded-stem layout probe (VERDICT r3 next #8)."""
    from probe_stem_s2d import main as ps_main
    return ps_main(["--json", "/tmp/stem_s2d.json"])


def item_r4_headline():
    import bench
    return {"img_per_s_chip": round(bench.bench_moma_histo(batch_size=128), 1)}


ITEMS = [
    ("moma_bs128", item_moma_bs128),
    ("moma_bs128_tq", item_moma_bs128_tq),
    ("moma_bs256", item_moma_bs256),
    ("moma_bs256_remat", item_moma_bs256_remat),
    ("serving_effib0", item_serving_effib0),
    ("serving_vit", item_serving_vit),
    ("attn_grad_pallas", item_attn_grad_pallas),
    ("moma_attn_all", item_moma_attn_all),
    ("moma_bs512", item_moma_bs512),
    ("moma_bs512_accum4", item_moma_bs512_accum4),
    ("moma_k65536", item_moma_k65536),
    ("moma_k262144", item_moma_k262144),
    ("r3_kl_exact_full", item_r3_kl_exact_full),
    ("r3_bf16_convergence", item_r3_bf16_convergence),
    ("r3_flash_tune_16640", item_r3_flash_tune_16640),
    ("r3_attn_all_k65536", item_r3_attn_all_k65536),
    ("r3_flash_tune_65792", item_r3_flash_tune_65792),
    ("r3_attn_all_k131072", item_r3_attn_all_k131072),
    ("r3_flash_tune_131328", item_r3_flash_tune_131328),
    ("r3b_attn_grad_pallas", item_r3b_attn_grad_pallas),
    ("r3b_flash_times", item_r3b_flash_times),
    ("r3b_attn_all_bs128", item_r3b_attn_all_bs128),
    ("r3b_attn_all_k65536", item_r3b_attn_all_k65536),
    ("r3b_attn_all_k131072", item_r3b_attn_all_k131072),
    ("r3b_kl_exact_cost_full", item_r3b_kl_exact_cost_full),
    ("r4_flagship_bf16", item_r4_flagship_bf16),
    ("r4_flagship_f32", item_r4_flagship_f32),
    ("r4_flagship_chaos", item_r4_flagship_chaos),
    ("r4_flash_bigN_16640", item_r4_flash_bigN_16640),
    ("r4_flash_bigN_65792", item_r4_flash_bigN_65792),
    ("r4_flash_bigN_131328", item_r4_flash_bigN_131328),
    ("r4_attn_all_bs128", item_r4_attn_all_bs128),
    ("r4_attn_all_k65536", item_r4_attn_all_k65536),
    ("r4_attn_all_k131072", item_r4_attn_all_k131072),
    ("r4_stem_s2d", item_r4_stem_s2d),
    ("r4_headline", item_r4_headline),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None, help="comma list of item names")
    p.add_argument("--skip", default=None, help="comma list of item names")
    p.add_argument("--redo", action="store_true",
                   help="re-run items even if a result is recorded")
    a = p.parse_args(argv)
    only = set(a.only.split(",")) if a.only else None
    skip = set(a.skip.split(",")) if a.skip else set()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # bench_serving
    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    results = _load()
    for name, fn in ITEMS:
        if only is not None and name not in only:
            continue
        if name in skip:
            continue
        prev = results.get(name)
        if prev and prev.get("ok") and not a.redo:
            print(f"[pending] {name}: already recorded -> {prev['value']}",
                  flush=True)
            continue
        print(f"[pending] {name}: running ...", flush=True)
        t0 = time.time()
        try:
            value = fn()
            results[name] = {"ok": True, "value": value,
                             "elapsed_s": round(time.time() - t0, 1),
                             "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime())}
            print(f"[pending] {name}: OK {value} "
                  f"({results[name]['elapsed_s']}s)", flush=True)
        except Exception as e:  # record and move on — OOM etc.
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}",
                             "trace": traceback.format_exc()[-2000:],
                             "elapsed_s": round(time.time() - t0, 1)}
            print(f"[pending] {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        _flush(results)
    print(json.dumps({k: v.get("value") if v.get("ok") else "FAILED"
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
