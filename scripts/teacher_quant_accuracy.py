"""Accuracy cost of --teacher_quant int8 (dynamic-int8 teacher forwards).

Runs OUR MoMA loop twice from identical inits/data/batch order — fp
teacher vs dynamic-int8 teacher (train/moma.py::_teacher_apply) — on the
learnable synthetic task of scripts/e2e_accuracy_parity.py, and reports
final val top-1 plus the loss-curve divergence.  CPU-runnable; the f32
chaos context from BASELINE.md applies (mid-climb deltas are chaotic,
converged deltas are meaningful).

  python scripts/teacher_quant_accuracy.py [--epochs 3] [--noise 0.3]
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


def run(teacher_quant: str, train_x, train_y, val_x, val_y, epochs: int):
    import jax

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

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          shuffle_bn=False, kl_teacher_bn="train",
                          teacher_quant=teacher_quant)
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    mesh = create_mesh(jax.devices()[:1])
    model = create_model("resnet8", num_classes=N_CLS)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT,
                     s_dim=64, t_dim=64)
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
            curve.append(float(metrics["loss"]))

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
        correct += int((np.argmax(np.asarray(logits), 1)
                        == val_y[i:i + 64]).sum())
    return curve, 100.0 * correct / len(val_y)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--train_n", type=int, default=512)
    p.add_argument("--val_n", type=int, default=1000)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    train_x, train_y = make_task(a.train_n, seed=123, noise=a.noise)
    val_x, val_y = make_task(a.val_n, seed=456, noise=a.noise)

    curve_fp, acc_fp = run("none", train_x, train_y, val_x, val_y, a.epochs)
    curve_q, acc_q = run("int8", train_x, train_y, val_x, val_y, a.epochs)

    c_fp, c_q = np.asarray(curve_fp), np.asarray(curve_q)
    drift = np.abs(c_q - c_fp) / np.maximum(np.abs(c_fp), 1e-9)
    out = {
        "noise": a.noise, "epochs": a.epochs, "steps": len(curve_fp),
        "val_acc_fp": acc_fp, "val_acc_int8_teacher": acc_q,
        "acc_gap_pts": acc_fp - acc_q,
        "loss_corr": float(np.corrcoef(c_fp, c_q)[0, 1]),
        "median_step_drift": float(np.median(drift)),
        "final_loss_fp": float(c_fp[-1]), "final_loss_q": float(c_q[-1]),
    }
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
