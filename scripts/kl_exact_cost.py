"""Measured cost of kl_teacher_bn='exact' vs 'train' (VERDICT weak #3).

'exact' reproduces the reference's REAL teacher-BN schedule — the
per-epoch model_t.eval() reset makes the KL forward use running stats on
each epoch's FIRST batch and batch stats after (loops_moma.py:224-227,
314-318).  'train' (the round-1/2 default) deviates on exactly that one
step per epoch.  The stated reason 'exact' wasn't the default was the
cost of its SECOND jitted program.  This probe measures that cost:

  1. steady-state proof (any platform): the 'exact' mode's rest-of-epoch
     program and the 'train' program lower to IDENTICAL HLO — zero
     steady-state throughput cost, by construction, not by measurement;
  2. the extra compile (TPU): wall-clock of compiling the first-batch
     (eval-BN KL) program, cold and with the persistent cache warm.

  python scripts/kl_exact_cost.py [--platform cpu|tpu] [--full_size]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(platform: str, full_size: bool):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from moma_tpu.core.config import (Config, DistillConfig, ModelConfig,
                                      MomaConfig)
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    if full_size:
        name, hw, bs, n_cls, feat, k_neg = "effiB0", 512, 128, 4, 512, 16384
        dtype = jnp.bfloat16
    else:
        name, hw, bs, n_cls, feat, k_neg = "resnet8", 32, 8, 4, 32, 64
        dtype = None

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = bs
    cfg.data.image_size = hw
    cfg.run.half_precision = dtype is not None
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=feat, nce_k=k_neg, nce_t=0.15, alpha=0.999,
                          mem="MoCo", head="mlp", attn="self")
    cfg.model_s = ModelConfig(name=name, n_cls=n_cls)
    cfg.model_t = ModelConfig(name=name, n_cls=n_cls)

    mesh = create_mesh(jax.devices()[:1])
    model = create_model(name, num_classes=n_cls, dtype=dtype)
    sample = jnp.zeros((2, hw, hw, 3), dtype or jnp.float32)
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)
    fs, _ = probe_shapes(model, hw, bs)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=feat, s_dim=s_dim,
                     t_dim=s_dim, dtype=dtype)
    cmo_params, cmo_bs = heads.init(jax.random.PRNGKey(2))
    queue = QueueState.create(jax.random.PRNGKey(3), k_neg, feat)
    tx = make_sgd(0.05, 0.9, 5e-4)
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

    if full_size:
        from moma_tpu.data.histo_augment import make_histo_augment
        cfg.data.dataset = "prostate_hv"
        augment = make_histo_augment(cfg)
        cfg.data.dataset = "synthetic"
    else:
        augment = None

    def mk(mode, override=None):
        import copy
        c = copy.deepcopy(cfg)
        c.moma.kl_teacher_bn = mode
        return make_moma_train_step(c, heads, augment, donate=False,
                                    kl_train_bn_override=override)

    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (bs, hw, hw, 3), dtype=np.uint8)
            if full_size else rs.rand(bs, hw, hw, 3).astype(np.float32),
            data_sharding(mesh)),
        "label": jax.device_put(rs.randint(0, n_cls, (bs,)).astype(np.int32),
                                data_sharding(mesh, ndim=1)),
    }
    return mk, state, batch


def role_hash(platform, full_size, mode, override):
    """Lower ONE program in a fresh process and print its HLO hash.

    Fresh-process isolation matters: in-process trace counters (Pallas
    kernel names etc.) make a SECOND lowering of even the same function
    textually different — comparing two programs' text is only meaningful
    when each is the FIRST lowering of its process (measured round 3:
    same-process train-vs-exact_rest hashes diverged at full size while
    fresh-process hashes match)."""
    import jax

    mk, state, batch = build(platform, full_size)
    lw = mk(mode, override=override).lower(state, batch, jax.random.PRNGKey(7))
    h = hashlib.sha256(lw.as_text().encode()).hexdigest()
    print(f"HASH {h}")
    return h


def role_compile(platform, full_size):
    """Compile BOTH 'exact' programs in run_moma's order (first-batch
    eval-BN program, then the steady train-BN one) in a fresh process and
    print wall-clock per compile — run twice by main(): pass 1 = cold
    compiles, pass 2 = the persistent-cache cost a user actually pays."""
    import jax

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    mk, state, batch = build(platform, full_size)
    rng = jax.random.PRNGKey(7)
    times = {}
    for name, (mode, override) in (
        ("first", ("exact", False)), ("rest", ("exact", True)),
    ):
        t0 = time.perf_counter()
        mk(mode, override=override).lower(state, batch, rng).compile()
        times[name] = round(time.perf_counter() - t0, 2)
    print(f"TIMES {json.dumps(times)}")
    return times


def _child(args):
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import kl_exact_cost as K\n"
        "K.%s\n" % (os.path.dirname(os.path.abspath(__file__)), args)
    )
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(f"child {args} failed:\n{p.stderr[-2000:]}")
    return p.stdout


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=("cpu", "tpu"), default="cpu")
    p.add_argument("--full_size", action="store_true",
                   help="the real effiB0@512 BS128 step (TPU)")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    out = {"platform": a.platform, "full_size": a.full_size}
    args = f"{a.platform!r}, {bool(a.full_size)}"

    # (1) steady-state proof: 'train' program == 'exact' rest-program.
    # One fresh process per lowering (see role_hash).
    h_train = _child(f"role_hash({args}, 'train', None)").split("HASH ")[1].split()[0]
    h_rest = _child(f"role_hash({args}, 'exact', True)").split("HASH ")[1].split()[0]
    h_first = _child(f"role_hash({args}, 'exact', False)").split("HASH ")[1].split()[0]
    out["steady_state_hlo_identical"] = h_train == h_rest
    out["first_differs_from_steady"] = h_first != h_rest
    out["hlo_train"] = h_train[:16]
    out["hlo_exact_rest"] = h_rest[:16]

    # (2) compile cost of the two-program schedule, run_moma order:
    # pass 1 cold (first-ever run), pass 2 with the persistent cache warm
    # (every later process start).
    t_cold = json.loads(_child(f"role_compile({args})").split("TIMES ")[1])
    t_warm = json.loads(_child(f"role_compile({args})").split("TIMES ")[1])
    out["compile_cold_s"] = t_cold
    out["compile_warm_s"] = t_warm

    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
