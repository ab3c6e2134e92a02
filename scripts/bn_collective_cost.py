"""Quantify the per-step collective cost of sync-BN vs per-device BN.

Compiles the full MoMA train step (effiB0 student + EMA teacher) for an
8-device mesh in each BN execution mode and counts the cross-device
collectives in the optimized SPMD HLO:

  bn='global' : jit over the data-sharded batch — XLA partitions the
                global-batch BN reductions, i.e. IMPLICIT sync-BN: every
                BatchNorm's stats contribute one cross-chip reduction in
                fwd (+ its gradient reductions in bwd).
  bn='sync'   : shard_map + explicit per-BN pmean — same semantics, the
                collectives are explicit in the body.
  bn='local'  : shard_map, per-device stats — BN contributes NO
                collectives; what remains is the DDP set (grad pmean,
                metric pmean) + Shuffle-BN's two all_gathers.

Run on the virtual CPU mesh (no TPU needed — collective COUNTS and
operand bytes are topology-independent):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/bn_collective_cost.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(bn: str, image_size: int, batch: int):
    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = batch
    cfg.data.image_size = image_size
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=512, nce_k=2048, nce_t=0.15, alpha=0.999,
                          mem="MoCo", head="mlp", attn="self")
    cfg.model_s.n_cls = 4
    cfg.run.bn = bn

    mesh = create_mesh(jax.devices()[:8])
    model = create_model("effiB0", num_classes=4)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, image_size, image_size, 3))
    vars_s = model.init(k1, sample, train=False)
    vars_t = model.init(k2, sample, train=False)
    fs, _ = probe_shapes(model, image_size, batch)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=512, s_dim=s_dim,
                     t_dim=s_dim)
    cmo_params, cmo_bs = heads.init(k3)
    queue = QueueState.create(k4, cfg.moma.nce_k, 512)
    tx = make_sgd(lr_schedule(0.05, 2, 2, cosine=True), 0.9, 1e-4)
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
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False,
                                   mesh=mesh)
    rs = np.random.RandomState(0)
    batch_d = {
        "image": jax.device_put(
            rs.rand(batch, image_size, image_size, 3).astype(np.float32),
            data_sharding(mesh),
        ),
        "label": jax.device_put(
            rs.randint(0, 4, (batch,)).astype(np.int32),
            data_sharding(mesh, ndim=1),
        ),
    }
    return step_fn, state, batch_d


_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def _bytes_of(shape_str: str) -> int:
    sizes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
             "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}
    total = 0
    for dt, dims in _SHAPE.findall(shape_str):
        if dt not in sizes:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sizes[dt]
    return total


def count_collectives(hlo: str):
    out = {}
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT )?[%\w.-]+ = (.*?) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)"
                     r"(?:-start)?\(", s)
        if m and "-done" not in s.split("=")[1][:40]:
            kind = m.group(2)
            cnt, byt = out.get(kind, (0, 0))
            out[kind] = (cnt + 1, byt + _bytes_of(m.group(1)))
    return out


def main():
    image_size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 64
    batch = 16
    print(f"effiB0 MoMA step, {image_size}px, global batch {batch}, "
          f"8-device mesh — optimized SPMD HLO collectives:")
    for bn in ("global", "sync", "local"):
        step_fn, state, batch_d = build(bn, image_size, batch)
        lowered = step_fn.lower(state, batch_d, jax.random.PRNGKey(1))
        hlo = lowered.compile().as_text()
        counts = count_collectives(hlo)
        total_ops = sum(c for c, _ in counts.values())
        total_mb = sum(b for _, b in counts.values()) / 1e6
        detail = ", ".join(
            f"{k}: {c} ({b / 1e6:.2f} MB)" for k, (c, b) in sorted(counts.items())
        )
        print(f"  bn={bn:7s}: {total_ops:4d} collectives, {total_mb:8.2f} MB "
              f"— {detail}")


if __name__ == "__main__":
    main()
