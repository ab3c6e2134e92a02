"""Deep per-op analysis of the MoMA train step on TPU.

Captures a device trace (full op names) + the compiled optimized HLO,
then prints the top ops by device time with their HLO definition summary:
operand shapes/bytes, body opcode mix.  This pins exactly which fusions
eat the step and what they re-read.

Run: python scripts/analyze_step.py [mode] [out_prefix]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.cache import enable_compilation_cache
from moma_tpu.ops import fused_bn as FB

enable_compilation_cache()

MODE = sys.argv[1] if len(sys.argv) > 1 else "xla"
PREFIX = sys.argv[2] if len(sys.argv) > 2 else "/tmp/moma_step"
ITERS = 10


def build():
    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.histo_augment import make_histo_augment
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    batch_size = int(os.environ.get("MOMA_BS", "64"))
    image_size = 512
    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = batch_size
    cfg.data.image_size = image_size
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=512, nce_k=16384, nce_t=0.15, alpha=0.999,
                          mem="MoCo", head="mlp", attn="self")
    cfg.model_s.n_cls = 4

    mesh = create_mesh()
    model = create_model("effiB0", num_classes=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, image_size, image_size, 3), jnp.bfloat16)
    vars_s = model.init(k1, sample, train=False)
    vars_t = model.init(k2, sample, train=False)
    fs, _ = probe_shapes(model, image_size, batch_size)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=512, s_dim=s_dim,
                     t_dim=s_dim, dtype=jnp.bfloat16)
    cmo_params, cmo_bs = heads.init(k3)
    queue = QueueState.create(k4, cfg.moma.nce_k, 512)
    tx = make_sgd(lr_schedule(0.05, 50, 100, cosine=True), 0.9, 1e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    augment = make_histo_augment(cfg)
    # donate=False so the same state can be reused across timed calls
    step_fn = make_moma_train_step(cfg, heads, augment, donate=False)

    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (batch_size, image_size, image_size, 3),
                       dtype=np.uint8),
            data_sharding(mesh),
        ),
        "label": jax.device_put(
            rs.randint(0, 4, (batch_size,)).astype(np.int32),
            data_sharding(mesh, ndim=1),
        ),
    }
    return step_fn, state, batch


def main():
    FB.set_fused_bn(MODE)
    step_fn, state, batch = build()
    rng = jax.random.PRNGKey(1)

    lowered = step_fn.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    hlo_path = f"{PREFIX}_{MODE}.hlo"
    with open(hlo_path, "w") as f:
        f.write(hlo)
    print(f"HLO: {hlo_path} ({len(hlo)/1e6:.1f} MB)", flush=True)

    # warmup
    for i in range(3):
        state2, m = step_fn(state, batch, jax.random.fold_in(rng, i))
        _ = float(m["loss"])

    trace_dir = f"{PREFIX}_{MODE}_trace"
    jax.profiler.start_trace(trace_dir)
    for i in range(ITERS):
        state2, m = step_fn(state, batch, jax.random.fold_in(rng, 100 + i))
    l = float(m["loss"])
    jax.profiler.stop_trace()
    print("loss:", l, flush=True)

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    lanes = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in lanes.items() if n.startswith("/device:")}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in device_pids:
            name = e.get("name", "?")
            # "$"-sugar and module-level "jit_*" spans contain the op spans;
            # counting them double-counts (conv_ceiling.py skips them too)
            if name.startswith("$") or name.startswith("jit_"):
                continue
            agg[name] += e["dur"]
            cnt[name] += 1
    total = sum(agg.values()) / 1000 / ITERS
    print(f"\ntotal device time {total:.1f} ms/step; top ops:", flush=True)

    # index HLO definitions by op name
    hlo_lines = {}
    for line in hlo.splitlines():
        mm = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if mm:
            hlo_lines[mm.group(1)] = line.strip()

    def op_summary(name):
        line = hlo_lines.get(name) or hlo_lines.get(name.replace("%", ""))
        if not line:
            return "(hlo def not found)"
        shapes = re.findall(r"(?:bf16|f32|f16|s32|u32|u8|pred)\[[\d,]*\]", line)
        kind = re.search(r"= \S+ (\w+)", line)
        return (kind.group(1) if kind else "?") + " " + " ".join(shapes[:8])

    for name, dur in agg.most_common(28):
        print(f"  {dur/1000/ITERS:7.2f} ms  x{cnt[name]//ITERS:3d}  {name:40s} "
              f"{op_summary(name)[:140]}", flush=True)


if __name__ == "__main__":
    main()
