"""Device-trace floor analysis of the flash kernels IN-STEP (VERDICT
r3 #4 tail: the one op family without a trace-based floor).

Standalone flash chains mislead in both directions on the axon relay
(CLAUDE.md session-19), so this captures a device trace of the REAL
MoCoAtt attn='all' MoMA step (the bench config) and aggregates the
Pallas flash kernels' device time against the analytic compute/HBM
floors of scripts/tune_flash_bigN.floors_ms.  Device-op durations are
hardware timestamps — host CPU contention does not distort them.

  python scripts/trace_flash_instep.py [--nce_k 16384] [--json OUT]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 8


def build(nce_k: int):
    import jax
    import jax.numpy as jnp

    # mirrors bench.bench_moma_histo's build exactly (the headline
    # attn='all' config) with donate=False so state is reusable
    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.histo_augment import make_histo_augment
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    B, HW = 128, 512
    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = B
    cfg.data.image_size = HW
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=512, nce_k=nce_k, nce_t=0.15,
                          alpha=0.999, mem="MoCoAtt", head="mlp",
                          attn="all")
    cfg.model_s.n_cls = 4
    mesh = create_mesh()
    model = create_model("effiB0", num_classes=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, HW, HW, 3), jnp.bfloat16)
    vars_s = model.init(k1, sample, train=False)
    vars_t = model.init(k2, sample, train=False)
    fs, _ = probe_shapes(model, HW, B)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="all", feat_dim=512, s_dim=s_dim,
                     t_dim=s_dim, dtype=jnp.bfloat16)
    cmo_params, cmo_bs = heads.init(k3)
    queue = QueueState.create(k4, nce_k, 512)
    tx = make_sgd(lr_schedule(0.05, 50, 100, cosine=True), 0.9, 1e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply,
        teacher_apply_fn=_teacher_apply(cfg, model),
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    augment = make_histo_augment(cfg)
    step_fn = make_moma_train_step(cfg, heads, augment, donate=False,
                                   kl_train_bn_override=True)
    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (B, HW, HW, 3), dtype=np.uint8),
            data_sharding(mesh)),
        "label": jax.device_put(
            rs.randint(0, 4, (B,)).astype(np.int32),
            data_sharding(mesh, ndim=1)),
    }
    return step_fn, state, batch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nce_k", type=int, default=16384)
    p.add_argument("--json", type=str, default="")
    p.add_argument("--reuse", action="store_true",
                   help="re-parse an existing trace dir without re-running")
    a = p.parse_args(argv)

    trace_dir = f"/tmp/flash_instep_k{a.nce_k}_trace"
    if not (a.reuse and glob.glob(
            f"{trace_dir}/plugins/profile/*/*.trace.json.gz")):
        from moma_tpu.core.cache import enable_compilation_cache
        enable_compilation_cache()
        import jax

        step_fn, state, batch = build(a.nce_k)
        rng = jax.random.PRNGKey(1)
        for i in range(3):
            _, m = step_fn(state, batch, jax.random.fold_in(rng, i))
            _ = float(m["loss"])

        jax.profiler.start_trace(trace_dir)
        for i in range(ITERS):
            _, m = step_fn(state, batch, jax.random.fold_in(rng, 100 + i))
        _ = float(m["loss"])
        jax.profiler.stop_trace()

    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    lanes = {e["pid"]: e["args"].get("name", "")
             for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p_ for p_, n in lanes.items() if n.startswith("/device:")}
    # per-OP spans carry rich args (long_name + python `source`); the
    # numeric-named per-step module envelopes on another tid lane do not
    # — keying on 'long_name' excludes the envelopes (which would
    # double-count the whole step)
    agg, cnt, src = collections.Counter(), collections.Counter(), {}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in device_pids:
            a_ = e.get("args") or {}
            if "long_name" not in a_:
                continue
            name = e.get("name", "?")
            agg[name] += e["dur"]
            cnt[name] += 1
            if name not in src:
                src[name] = a_.get("source", "")
    total = sum(agg.values()) / 1000 / ITERS

    # flash kernels: identified by their PYTHON source attribution
    flash_ms = {n: agg[n] / 1000 / ITERS for n in agg
                if "flash_attention.py" in src.get(n, "")}
    flash_total = sum(flash_ms.values())

    from tune_flash_bigN import floors_ms
    N = 2 * 128 + a.nce_k
    from moma_tpu.ops.flash_attention import pick_blocks
    bq, bk_f, bk_b, npad = pick_blocks(N)
    fc, fh, gc, gh = floors_ms(N, npad, bq)
    floor_total = max(gc, gh)  # fwd+bwd floor (floors_ms grad is inclusive)

    print(f"\ntotal device {total:.1f} ms/step; flash kernels "
          f"{flash_total:.2f} ms/step across {len(flash_ms)} op names")
    for n, v in sorted(flash_ms.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v:8.3f} ms  x{cnt[n]//ITERS:<3d} {n[:90]}")
    print(f"analytic fwd+grad floor at N={N} (pick {bk_f}/{bk_b}/"
          f"npad {npad}): {floor_total:.2f} ms -> flash runs "
          f"{flash_total / max(floor_total, 1e-9):.2f}x floor")
    out = {"nce_k": a.nce_k, "N": N,
           "total_ms_step": round(total, 1),
           "flash_ms_step": round(flash_total, 2),
           "floor_ms": round(floor_total, 2),
           "x_floor": round(flash_total / max(floor_total, 1e-9), 2),
           "pick": [bq, bk_f, bk_b, npad],
           "flash_ops": {n: round(v, 3) for n, v in flash_ms.items()}}
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "flash_ops"}))


if __name__ == "__main__":
    main()
