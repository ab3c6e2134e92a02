"""Converged-accuracy evidence for the SHIPPED bf16 default.

The framework trains with a bf16 compute policy by default
(core/config.py half_precision=True -> model dtype=bfloat16, f32
params/optimizer — the TPU-native replacement for the reference's
opt-in apex AMP, /root/reference/learning/contrast_trainer.py:40-69),
but every accuracy study before round 3 ran f32.  This harness runs OUR
MoMA loop twice from identical inits/data/batch order — f32 model vs
bf16 model (exactly the half_precision switch of train/moma.py:1077) —
on the learnable synthetic task of scripts/e2e_accuracy_parity.py, plus
an f32 chaos-floor run (1e-7 nudge on one weight), and reports the
converged val top-1 of each.

The meaningful comparison (BASELINE.md round-2 chaos study): gaps are
only interpretable at stable convergence (default noise 0.3), where the
measured f32 chaos floor is ~0.3 pts; mid-climb trajectories move >10
pts under a 1-ULP nudge.

Platform-selectable: --platform cpu (default; virtual mesh) or tpu
(the real chip — the precision users actually ship on).

  python scripts/bf16_accuracy.py [--platform cpu|tpu] [--epochs 3]
         [--noise 0.3] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, HW, N_CLS, FEAT, K = 8, 32, 4, 32, 64
LR, MOM, WD, ALPHA, T_NCE, KD_T = 0.05, 0.9, 5e-4, 0.999, 0.15, 4.0


def make_task(n: int, seed: int, noise: float):
    """scripts/e2e_accuracy_parity.py:44-61 (same templates, same mix)."""
    tmpl_rs = np.random.RandomState(777)
    templates = tmpl_rs.rand(N_CLS, HW, HW, 3).astype(np.float32)
    for _ in range(3):
        templates = (np.roll(templates, 1, 1) + np.roll(templates, -1, 1)
                     + np.roll(templates, 1, 2) + np.roll(templates, -1, 2)
                     + templates) / 5.0
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, N_CLS, (n,))
    x = (1.0 - noise) * templates[labels] + noise * rs.rand(
        n, HW, HW, 3).astype(np.float32)
    return x.astype(np.float32), labels.astype(np.int64)


def run(precision: str, platform: str, train_x, train_y, val_x, val_y,
        epochs: int, perturb: float = 0.0):
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
    from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    dtype = jnp.bfloat16 if precision == "bf16" else None

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.run.half_precision = precision == "bf16"
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          shuffle_bn=False, kl_teacher_bn="train")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    mesh = create_mesh(jax.devices()[:1])
    model = create_model("resnet8", num_classes=N_CLS, dtype=dtype)
    sample = jnp.zeros((2, HW, HW, 3))
    # identical f32 INIT in both precisions (params are f32 either way —
    # only the compute dtype differs, like train/moma.py:1077-1094)
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)
    if perturb:
        flat, tree = jax.tree_util.tree_flatten(vars_s["params"])
        flat[0] = flat[0].at[(0,) * flat[0].ndim].add(perturb)
        vars_s = dict(vars_s, params=jax.tree_util.tree_unflatten(tree, flat))
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT,
                     s_dim=64, t_dim=64, dtype=dtype)
    cmo_params, cmo_bs = heads.init(jax.random.PRNGKey(2))
    queue = QueueState.create(jax.random.PRNGKey(3), K, FEAT)
    tx = make_sgd(LR, momentum=MOM, weight_decay=WD)
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
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False)

    n_steps = len(train_y) // B
    curve = []
    for epoch in range(epochs):
        for i in range(n_steps):
            sl = slice(i * B, (i + 1) * B)
            batch = {
                "image": jax.device_put(train_x[sl], data_sharding(mesh)),
                "label": jax.device_put(train_y[sl].astype(np.int32),
                                        data_sharding(mesh, ndim=1)),
            }
            state, metrics = step_fn(
                state, batch, jax.random.PRNGKey(epoch * 10_000 + i))
            curve.append(metrics["loss"])
    curve = [float(v) for v in curve]  # one sync point (TPU-friendly)

    @jax.jit
    def eval_logits(params, bs, images):
        _, logits = model.apply(
            {"params": params, "batch_stats": bs}, images, train=False)
        return logits

    correct = 0
    for i in range(0, len(val_y), 64):
        logits = eval_logits(
            state.params["student"], state.batch_stats["student"],
            jnp.asarray(val_x[i:i + 64]))
        correct += int((np.argmax(np.asarray(logits, np.float32), 1)
                        == val_y[i:i + 64]).sum())
    return curve, 100.0 * correct / len(val_y)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=("cpu", "tpu"), default="cpu")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--train_n", type=int, default=512)
    p.add_argument("--val_n", type=int, default=1000)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--skip_chaos", action="store_true")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    train_x, train_y = make_task(a.train_n, seed=123, noise=a.noise)
    val_x, val_y = make_task(a.val_n, seed=456, noise=a.noise)

    curve_fp, acc_fp = run("f32", a.platform, train_x, train_y, val_x, val_y,
                           a.epochs)
    curve_bf, acc_bf = run("bf16", a.platform, train_x, train_y, val_x, val_y,
                           a.epochs)
    acc_chaos = None
    if not a.skip_chaos:
        _, acc_chaos = run("f32", a.platform, train_x, train_y, val_x, val_y,
                           a.epochs, perturb=1e-7)

    c_fp, c_bf = np.asarray(curve_fp), np.asarray(curve_bf)
    drift = np.abs(c_bf - c_fp) / np.maximum(np.abs(c_fp), 1e-9)
    out = {
        "platform": a.platform, "noise": a.noise, "epochs": a.epochs,
        "steps": len(curve_fp),
        "val_acc_f32": acc_fp, "val_acc_bf16": acc_bf,
        "bf16_gap_pts": acc_fp - acc_bf,
        "f32_chaos_val_acc": acc_chaos,
        "f32_chaos_floor_pts": (abs(acc_fp - acc_chaos)
                                if acc_chaos is not None else None),
        "loss_corr": float(np.corrcoef(c_fp, c_bf)[0, 1]),
        "median_step_drift": float(np.median(drift)),
        "final_loss_f32": float(c_fp[-1]), "final_loss_bf16": float(c_bf[-1]),
    }
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
