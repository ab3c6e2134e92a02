"""Measured END-TO-END accuracy/trajectory parity vs the executed reference.

Runs the ACTUAL reference MoMA training procedure (the real modules, the
real per-epoch model_t.eval() reset of helper/loops_moma.py:224-227, the
real SGD recipe) on CPU for full epochs over a LEARNABLE synthetic task,
and the moma_tpu jitted step on identical data/weights/batch order —
then compares final validation top-1 and the full loss curves.  This
turns the BASELINE.json "top-1 within 0.3%" target from a 12-step
loss-curve extrapolation into a measured end-to-end number.

Both sides: resnet8 student + resnet8 momentum teacher, MoCo K=64,
mlp head + self attention, SGD lr=0.05 m=0.9 wd=5e-4 (constant LR),
identity shuffle (set-equivalent; pinned on both sides), batch order
pinned.  Ours runs kl_teacher_bn='train' — the documented one-step-per-
epoch BN deviation is INCLUDED in what this measures.

Usage:
  python scripts/e2e_accuracy_parity.py [--epochs 2] [--train_n 512]
         [--val_n 512] [--json OUT]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"

B, HW, N_CLS = 8, 32, 4
S_DIM, FEAT = 64, 32
K, T_NCE = 64, 0.15
ALPHA = 0.999
LR, MOM, WD = 0.05, 0.9, 5e-4  # LR overridable via --lr
KD_T = 4.0


def make_task(n: int, seed: int, noise: float = 0.75):
    """Learnable synthetic classification: low-frequency class templates
    + per-sample noise.  the default mix keeps epoch-2 accuracy
    between chance and ceiling so the comparison is informative."""
    tmpl_rs = np.random.RandomState(777)
    templates = tmpl_rs.rand(N_CLS, HW, HW, 3).astype(np.float32)
    for _ in range(3):  # box-blur -> low-frequency, conv-learnable
        templates = (
            np.roll(templates, 1, 1) + np.roll(templates, -1, 1)
            + np.roll(templates, 1, 2) + np.roll(templates, -1, 2)
            + templates
        ) / 5.0
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, N_CLS, (n,))
    x = (1.0 - noise) * templates[labels] + noise * rs.rand(
        n, HW, HW, 3
    ).astype(np.float32)
    return x.astype(np.float32), labels.astype(np.int64)


def run_reference(train_x, train_y, val_x, val_y, epochs: int,
                  perturb: float = 0.0, step_times=None):
    sys.path.insert(0, REF)
    sys.modules.setdefault(
        "tensorboard_logger", types.ModuleType("tensorboard_logger")
    )
    import torch
    import torch.nn as nn

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    torch.randperm = lambda n, **kw: torch.arange(n)  # type: ignore

    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29541", rank=0, world_size=1
        )

    from distiller_zoo import DistillKL
    from learning.contrast_trainer import ContrastTrainer
    from MoMA.criterion_moco_att import CMO
    from MoMA.mem_moco import MoCo
    from models.resnet import resnet8

    opt_shim = types.SimpleNamespace(
        s_dim=S_DIM, t_dim=S_DIM, feat_dim=FEAT, head="mlp", attn="self",
        local_rank=0, node_rank=0, ngpus_per_node=1, mem="MoCo",
    )
    torch.manual_seed(3)
    model_s = resnet8(num_classes=N_CLS)
    model_t = resnet8(num_classes=N_CLS)
    cmo = CMO(opt_shim)
    mem = MoCo(FEAT, K=K, T=T_NCE)
    rs = np.random.RandomState(5)
    memory_np = rs.randn(K, FEAT).astype(np.float32)
    memory_np /= np.linalg.norm(memory_np, axis=1, keepdims=True)
    with torch.no_grad():
        mem.memory.copy_(torch.from_numpy(memory_np))
    if perturb:
        # chaos baseline: nudge ONE weight by `perturb` — any acc gap this
        # produces at the same horizon is pure f32 trajectory divergence,
        # the noise floor for the ours-vs-reference comparison
        with torch.no_grad():
            w = next(model_s.parameters())
            w.view(-1)[0] += perturb
    snap = {
        "model_s": copy.deepcopy(model_s.state_dict()),
        "model_t": copy.deepcopy(model_t.state_dict()),
        "cmo": copy.deepcopy(cmo.state_dict()),
        "memory": memory_np,
    }

    trainer = ContrastTrainer.__new__(ContrastTrainer)
    trainer.args = opt_shim
    trainer.local_group = None
    trainable = (
        list(model_s.parameters()) + list(cmo.embed_s.parameters())
        + list(cmo.atts_q.parameters()) + list(cmo.atts_k.parameters())
        + list(cmo.atts_queue.parameters())
    )
    opt = torch.optim.SGD(trainable, lr=LR, momentum=MOM, weight_decay=WD)
    ce = nn.CrossEntropyLoss()
    kl = DistillKL(KD_T)

    n_steps = len(train_y) // B
    curve = []

    def set_bn_train(m):
        if "BatchNorm" in m.__class__.__name__:
            m.train()

    for epoch in range(epochs):
        # train_distill_moma epoch preamble (loops_moma.py:224-227)
        model_s.train()
        cmo.train()
        model_t.eval()
        for i in range(n_steps):
            t0 = time.perf_counter()
            sl = slice(i * B, (i + 1) * B)
            images = torch.from_numpy(
                np.transpose(train_x[sl], (0, 3, 1, 2))
            ).contiguous()
            labels = torch.from_numpy(train_y[sl])
            feat_s, logit_s = model_s(images, is_feat=True)
            with torch.no_grad():
                _, logit_t = model_t(images, is_feat=True)
            loss_cls = ce(logit_s, labels)
            loss_div = kl(logit_s, logit_t)
            trainer.momentum_update(model_s, model_t, ALPHA)
            cmo.embed_t.eval()
            trainer.momentum_update(cmo.embed_s, cmo.embed_t, ALPHA)
            model_t.apply(set_bn_train)
            k_, all_k = trainer._shuffle_bn(
                images, model_t, model_ema_head=cmo.embed_t
            )
            f_s = cmo.atts_q(cmo.embed_s(feat_s[-1]))
            k_ = cmo.atts_k(k_)
            all_k = cmo.atts_queue(all_k)
            logits, target = mem(q=f_s, k=k_, all_k=all_k)
            loss_kd = ce(logits, target)
            total = loss_cls + loss_div + loss_kd
            opt.zero_grad()
            total.backward()
            opt.step()
            curve.append(
                (float(loss_cls.detach()), float(loss_div.detach()),
                 float(loss_kd.detach()))
            )
            if step_times is not None:
                step_times.append(time.perf_counter() - t0)

    # validate_vanilla-style eval
    model_s.eval()
    correct = 0
    with torch.no_grad():
        for i in range(0, len(val_y), 64):
            images = torch.from_numpy(
                np.transpose(val_x[i:i + 64], (0, 3, 1, 2))
            ).contiguous()
            logits = model_s(images)
            correct += int((logits.argmax(1).numpy() == val_y[i:i + 64]).sum())
    acc = 100.0 * correct / len(val_y)
    return snap, curve, acc


def run_ours(snap, train_x, train_y, val_x, val_y, epochs: int,
             step_times=None, bf16: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig
    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.models import create_model
    from moma_tpu.models.torch_import import convert_state_dict
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.moma import make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          shuffle_bn=False, kl_teacher_bn="train")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    # bf16: the SHIPPED default precision (core/config.py half_precision
    # -> model compute dtype bfloat16, f32 params) vs the reference's f32
    dtype = jnp.bfloat16 if bf16 else None
    mesh = create_mesh(jax.devices()[:1])
    model = create_model("resnet8", num_classes=N_CLS, dtype=dtype)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)

    def to_np(sd):
        return {kk: np.asarray(vv) for kk, vv in sd.items()}

    conv_s = convert_state_dict(
        {kk: vv.numpy() for kk, vv in _torch_items(snap["model_s"])}, vars_s
    )
    conv_t = convert_state_dict(
        {kk: vv.numpy() for kk, vv in _torch_items(snap["model_t"])}, vars_t
    )
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM, dtype=dtype)
    cmo_params0, cmo_bs = heads.init(jax.random.PRNGKey(2))
    conv_cmo = convert_state_dict(
        {kk: vv.numpy() for kk, vv in _torch_items(snap["cmo"])},
        {"params": cmo_params0},
    )["params"]
    queue = QueueState(memory={"memory": jnp.asarray(snap["memory"])},
                       ptr=jnp.zeros((), jnp.int32))
    tx = make_sgd(LR, momentum=MOM, weight_decay=WD)
    params = {"student": conv_s["params"], "cmo": conv_cmo}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": conv_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=conv_t["params"],
        teacher_batch_stats=conv_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False)

    n_steps = len(train_y) // B
    curve = []
    for epoch in range(epochs):
        for i in range(n_steps):
            t0 = time.perf_counter()
            sl = slice(i * B, (i + 1) * B)
            batch = {
                "image": jax.device_put(train_x[sl], data_sharding(mesh)),
                "label": jax.device_put(train_y[sl].astype(np.int32),
                                        data_sharding(mesh, ndim=1)),
            }
            state, metrics = step_fn(
                state, batch, jax.random.PRNGKey(epoch * 10_000 + i)
            )
            curve.append((float(metrics["loss_cls"]),
                          float(metrics["loss_div"]),
                          float(metrics["loss_kd"])))
            if step_times is not None:
                step_times.append(time.perf_counter() - t0)

    @jax.jit
    def eval_logits(params, bs, images):
        _, logits = model.apply(
            {"params": params, "batch_stats": bs}, images, train=False
        )
        return logits

    correct = 0
    for i in range(0, len(val_y), 64):
        logits = eval_logits(
            state.params["student"], state.batch_stats["student"],
            jnp.asarray(val_x[i:i + 64]),
        )
        correct += int((np.argmax(np.asarray(logits), 1)
                        == val_y[i:i + 64]).sum())
    acc = 100.0 * correct / len(val_y)
    return curve, acc


def _torch_items(sd):
    return sd.items()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--train_n", type=int, default=512)
    p.add_argument("--val_n", type=int, default=1000)
    p.add_argument("--json", type=str, default="")
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--chaos_baseline", action="store_true",
                   help="also run the reference with a 1e-7 single-weight "
                        "nudge: its acc gap vs itself is the f32 chaos floor")
    p.add_argument("--bf16", action="store_true",
                   help="run OUR side under the shipped bf16 compute "
                        "policy (the reference side stays f32, like the "
                        "reference's default)")
    p.add_argument("--noise", type=float, default=0.6,
                   help="task difficulty: template/noise mix (0.75 = near-chance at 2 epochs; 0.6 = learnable)")
    a = p.parse_args(argv)

    global LR
    LR = a.lr
    train_x, train_y = make_task(a.train_n, seed=11, noise=a.noise)
    val_x, val_y = make_task(a.val_n, seed=12, noise=a.noise)

    snap, ref_curve, ref_acc = run_reference(
        train_x, train_y, val_x, val_y, a.epochs
    )
    chaos_acc = None
    if a.chaos_baseline:
        _, _, chaos_acc = run_reference(
            train_x, train_y, val_x, val_y, a.epochs, perturb=1e-7
        )
    got_curve, got_acc = run_ours(
        snap, train_x, train_y, val_x, val_y, a.epochs, bf16=a.bf16
    )

    rc = np.array(ref_curve)
    gc = np.array(got_curve)
    total_r, total_g = rc.sum(1), gc.sum(1)
    rel = np.abs(total_g - total_r) / np.maximum(np.abs(total_r), 1e-3)
    corr = float(np.corrcoef(total_r, total_g)[0, 1])
    out = {
        "epochs": a.epochs,
        "ours_precision": "bf16" if a.bf16 else "f32",
        "steps": len(ref_curve),
        "ref_val_acc": ref_acc,
        "ours_val_acc": got_acc,
        "acc_gap_pts": abs(ref_acc - got_acc),
        "ref_chaos_val_acc": chaos_acc,
        "chaos_gap_pts": (abs(ref_acc - chaos_acc)
                          if chaos_acc is not None else None),
        "loss_rel_drift_first32": float(rel[:32].max()),
        "loss_rel_drift_median": float(np.median(rel)),
        "loss_rel_drift_max": float(rel.max()),
        "loss_curve_corr": corr,
        "ref_final_loss": float(total_r[-1]),
        "ours_final_loss": float(total_g[-1]),
    }
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f)
    return out


if __name__ == "__main__":
    main()
