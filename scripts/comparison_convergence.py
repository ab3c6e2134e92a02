"""Convergence-level parity for the riskiest comparison distillers
(VERDICT r3 next #5): CRD (evolving dual banks + lazy Z), SimKD (reused
teacher classifier, incl. at eval), SemCKD (SelfA attention weights).

All 14 wired methods have single-step loss+gradient oracle parity
(tests/test_distill_step_parity.py); this harness runs the three
stateful/structurally-risky ones to STABLE CONVERGENCE against the
executed reference, the same protocol as the moma e2e study
(scripts/e2e_accuracy_parity.py): the actual reference modules
(crd/criterion.py CRDLoss with its ContrastMemory, models/util.py
SimKD/SelfA, helper/loops_moma.py:69-218 wiring) trained on CPU for
full epochs over the learnable synthetic task, vs our jitted
make_distill_train_step from identical weights / data / batch order /
contrast indices — then converged val top-1 and loss curves compared,
with a chaos-floor run (1e-7 nudge) to calibrate the gap.

The teacher is PRETRAINED (vanilla CE on the task, reference side) and
shared through the weight converter, so the distillation signal is real.

  python scripts/comparison_convergence.py [--methods crd,simkd,semckd]
         [--epochs 3] [--noise 0.3] [--json OUT]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

import numpy as np

B, HW, N_CLS = 8, 32, 4
C_CLS, C_DIV, C_BETA = 1.0, 1.0, 1.0
KD_T = 4.0
LR, MOM, WD = 0.05, 0.9, 5e-4
CC_FEAT = 32
NCE_K, NCE_T, NCE_M = 64, 0.07, 0.5
TEACHER_EPOCHS = 3


def make_task(n, seed, noise):
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


def _ref_setup():
    sys.path.insert(0, REF)
    sys.modules.setdefault("tensorboard_logger",
                           types.ModuleType("tensorboard_logger"))
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    return torch


def pretrain_teacher(train_x, train_y, val_x, val_y, epochs=TEACHER_EPOCHS):
    """Vanilla CE teacher (resnet32x4) on the task — reference side."""
    torch = _ref_setup()
    import torch.nn as nn
    from models.resnet import resnet32x4

    torch.manual_seed(1)
    model_t = resnet32x4(num_classes=N_CLS)
    opt = torch.optim.SGD(model_t.parameters(), lr=LR, momentum=MOM,
                          weight_decay=WD)
    ce = nn.CrossEntropyLoss()
    n_steps = len(train_y) // B
    model_t.train()
    for ep in range(epochs):
        for i in range(n_steps):
            sl = slice(i * B, (i + 1) * B)
            x = torch.from_numpy(
                np.transpose(train_x[sl], (0, 3, 1, 2))).contiguous()
            y = torch.from_numpy(train_y[sl])
            loss = ce(model_t(x), y)
            opt.zero_grad(); loss.backward(); opt.step()
    model_t.eval()
    correct = 0
    with torch.no_grad():
        for i in range(0, len(val_y), 50):
            x = torch.from_numpy(np.transpose(
                val_x[i:i + 50], (0, 3, 1, 2))).contiguous()
            correct += int((model_t(x).argmax(1).numpy()
                            == val_y[i:i + 50]).sum())
    print(f"[teacher] val acc {100.0 * correct / len(val_y):.2f} "
          f"({epochs} epochs)", flush=True)
    return model_t


def _crd_idx_for_step(rs, batch_index, n_data):
    neg = rs.randint(0, n_data, (len(batch_index), NCE_K))
    return np.concatenate([batch_index[:, None], neg], axis=1).astype(
        np.int64)


def run_reference(method, teacher, train_x, train_y, val_x, val_y,
                  epochs, perturb=0.0, perturb_idx=0):
    torch = _ref_setup()
    import torch.nn as nn
    from distiller_zoo import DistillKL, SemCKDLoss
    from models.resnet import resnet8
    from models.util import SelfA as RefSelfA
    from models.util import SimKD

    n_data = len(train_y)
    torch.manual_seed(0)
    model_s = resnet8(num_classes=N_CLS)
    model_t = teacher

    with torch.no_grad():
        model_s.eval()
        fs, _ = model_s(torch.randn(2, 3, HW, HW), is_feat=True)
        ft, _ = model_t(torch.randn(2, 3, HW, HW), is_feat=True)
    s_mid = [f.shape[1] for f in fs[1:-1]]
    t_mid = [f.shape[1] for f in ft[1:-1]]

    criterion_kd = None
    if method == "crd":
        from crd.criterion import CRDLoss
        opt_shim = types.SimpleNamespace(
            s_dim=fs[-1].shape[1], t_dim=ft[-1].shape[1], feat_dim=CC_FEAT,
            nce_k=NCE_K, nce_t=NCE_T, nce_m=NCE_M, n_data=n_data)
        aux = CRDLoss(opt_shim)
    elif method == "simkd":
        aux = SimKD(s_n=fs[-2].shape[1], t_n=ft[-2].shape[1], factor=2)
        criterion_kd = nn.MSELoss()
    elif method == "semckd":
        aux = RefSelfA(B, s_mid, t_mid, 1.0)
        criterion_kd = SemCKDLoss()
    else:
        raise SystemExit(method)

    if perturb:
        with torch.no_grad():
            next(model_s.parameters()).view(-1)[perturb_idx] += perturb

    snap = {
        "model_s": copy.deepcopy(model_s.state_dict()),
        "model_t": copy.deepcopy(model_t.state_dict()),
        "aux": copy.deepcopy(aux.state_dict()),
        "crd_banks": ((aux.contrast.memory_v1.numpy().copy(),
                       aux.contrast.memory_v2.numpy().copy())
                      if method == "crd" else None),
    }

    opt = torch.optim.SGD(
        list(model_s.parameters()) + list(aux.parameters()),
        lr=LR, momentum=MOM, weight_decay=WD)
    ce = nn.CrossEntropyLoss()
    kl = DistillKL(KD_T)
    cls_t = model_t.get_feat_modules()[-1]

    n_steps = n_data // B
    order_rs = np.random.RandomState(4242)
    crd_rs = np.random.RandomState(11)
    curve, orders, crd_idx_log = [], [], []
    for epoch in range(epochs):
        perm = order_rs.permutation(n_data)
        orders.append(perm.copy())
        model_s.train(); aux.train(); model_t.eval()
        for i in range(n_steps):
            bidx = perm[i * B:(i + 1) * B]
            x = torch.from_numpy(
                np.transpose(train_x[bidx], (0, 3, 1, 2))).contiguous()
            y = torch.from_numpy(train_y[bidx])
            feat_s, logit_s = model_s(x, is_feat=True)
            with torch.no_grad():
                feat_t, logit_t = model_t(x, is_feat=True)
                feat_t = [f.detach() for f in feat_t]
            loss_cls = ce(logit_s, y)
            loss_div = kl(logit_s, logit_t)
            if method == "crd":
                cidx = _crd_idx_for_step(crd_rs, bidx, n_data)
                crd_idx_log.append(cidx.copy())
                loss_kd = aux(feat_s[-1], feat_t[-1],
                              torch.from_numpy(bidx.astype(np.int64)),
                              torch.from_numpy(cidx))
            elif method == "simkd":
                tf_s, tf_t, pred = aux(feat_s[-2], feat_t[-2], cls_t)
                logit_s = pred  # metrics come from pred_feat_s (loops:188)
                loss_kd = criterion_kd(tf_s, tf_t)
            else:
                s_value, f_target, weight = aux(feat_s[1:-1], feat_t[1:-1])
                loss_kd = criterion_kd(s_value, f_target, weight)
            total = C_CLS * loss_cls + C_DIV * loss_div + C_BETA * loss_kd
            opt.zero_grad(); total.backward(); opt.step()
            curve.append((float(loss_cls.detach()), float(loss_div.detach()),
                          float(loss_kd.detach())))

    # eval: SimKD evaluates through bottleneck+cls_t (test.py/simkd eval
    # path, tests/test_simkd_eval.py); others: plain student
    model_s.eval(); aux.eval()
    correct = 0
    with torch.no_grad():
        for i in range(0, len(val_y), 50):
            x = torch.from_numpy(np.transpose(
                val_x[i:i + 50], (0, 3, 1, 2))).contiguous()
            if method == "simkd":
                f_s, _ = model_s(x, is_feat=True)
                f_t, _ = model_t(x, is_feat=True)
                _, _, logits = aux(f_s[-2], f_t[-2], cls_t)
            else:
                logits = model_s(x)
            correct += int((logits.argmax(1).numpy()
                            == val_y[i:i + 50]).sum())
    acc = 100.0 * correct / len(val_y)
    return {"snap": snap, "curve": curve, "acc": acc, "orders": orders,
            "crd_idx": crd_idx_log}


def run_ours(method, ref, train_x, train_y, val_x, val_y, epochs):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from moma_tpu.core.config import Config, DistillConfig, ModelConfig
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.models import create_model
    from moma_tpu.models.torch_import import convert_state_dict
    from moma_tpu.train.distill import (Distiller, make_distill_train_step,
                                        probe_shapes)
    from moma_tpu.train.state import DistillState, make_sgd

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_distill_step_parity import convert_aux

    n_data = len(train_y)
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill=method, cls=C_CLS, div=C_DIV,
                                beta=C_BETA, kd_T=KD_T, factor=2, soft=1.0)
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet32x4", n_cls=N_CLS)
    cfg.moma.feat_dim = CC_FEAT
    cfg.moma.nce_k, cfg.moma.nce_t, cfg.moma.nce_m = NCE_K, NCE_T, NCE_M

    mesh = create_mesh(jax.devices()[:1])
    student = create_model("resnet8", num_classes=N_CLS)
    teacher = create_model("resnet32x4", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = student.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = teacher.init(jax.random.fold_in(rng, 1), sample, train=False)

    def to_np(sd):
        return {k: v.numpy() for k, v in sd.items()}

    conv_s = convert_state_dict(to_np(ref["snap"]["model_s"]), vars_s)
    conv_t = convert_state_dict(to_np(ref["snap"]["model_t"]), vars_t)

    fs_shapes, _ = probe_shapes(student, HW, B)
    ft_shapes, _ = probe_shapes(teacher, HW, B)
    distiller = Distiller(cfg, fs_shapes, ft_shapes, n_data=n_data,
                          batch_size=B)
    aux_params, aux_bs = distiller.init_aux(jax.random.fold_in(rng, 2))
    conv_aux = convert_aux(method, to_np(ref["snap"]["aux"]),
                           {"params": aux_params, "batch_stats": aux_bs})

    extra = distiller.init_extra(jax.random.fold_in(rng, 3))
    if method == "crd":
        from moma_tpu.losses.crd import CRDMemory
        v1, v2 = ref["snap"]["crd_banks"]
        extra = CRDMemory(v1=jnp.asarray(v1), v2=jnp.asarray(v2),
                          z_v1=jnp.asarray(-1.0), z_v2=jnp.asarray(-1.0))

    tx = make_sgd(LR, momentum=MOM, weight_decay=WD)
    params = {"student": conv_s["params"], "aux": conv_aux["params"]}
    state = DistillState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": conv_s["batch_stats"],
                     "aux": conv_aux["batch_stats"]},
        teacher_params=conv_t["params"],
        teacher_batch_stats=conv_t["batch_stats"],
        opt_state=tx.init(params), extra=extra, tx=tx,
        apply_fn=student.apply, teacher_apply_fn=teacher.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_distill_train_step(distiller, augment_fn=None,
                                      donate=False)

    n_steps = n_data // B
    curve = []
    si = 0
    for epoch in range(epochs):
        perm = ref["orders"][epoch]
        for i in range(n_steps):
            bidx = perm[i * B:(i + 1) * B]
            batch = {
                "image": jax.device_put(train_x[bidx], data_sharding(mesh)),
                "label": jax.device_put(train_y[bidx].astype(np.int32),
                                        data_sharding(mesh, ndim=1)),
            }
            if method == "crd":
                batch["index"] = jax.device_put(
                    bidx.astype(np.int32), data_sharding(mesh, ndim=1))
                batch["contrast_idx"] = jax.device_put(
                    ref["crd_idx"][si].astype(np.int32),
                    data_sharding(mesh, ndim=2))
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
            curve.append((float(metrics["loss_cls"]),
                          float(metrics["loss_div"]),
                          float(metrics["loss_kd"])))
            si += 1

    # eval (simkd: bottleneck + reused teacher classifier — the same
    # make_simkd_eval_step the CLI uses, loops_moma.py:481-487)
    if method == "simkd":
        from moma_tpu.train.distill import make_simkd_eval_step
        es = make_simkd_eval_step(student, distiller, state.teacher_params,
                                  state.teacher_batch_stats, n_cls=N_CLS,
                                  normalize_fn=None)
        correct = 0
        for i in range(0, len(val_y), 50):
            batch = {"image": jnp.asarray(val_x[i:i + 50]),
                     "label": jnp.asarray(val_y[i:i + 50].astype(np.int32)),
                     "mask": jnp.ones(len(val_y[i:i + 50]), jnp.int32)}
            _, _, cm = es(state.params, state.batch_stats, batch)
            correct += int(np.trace(np.asarray(cm)))
    else:
        @jax.jit
        def logits_fn(params, bs, images):
            _, logits = student.apply(
                {"params": params["student"],
                 "batch_stats": bs["student"]}, images, train=False)
            return logits

        correct = 0
        for i in range(0, len(val_y), 50):
            logits = logits_fn(state.params, state.batch_stats,
                               jnp.asarray(val_x[i:i + 50]))
            correct += int((np.argmax(np.asarray(logits, np.float32), 1)
                            == val_y[i:i + 50]).sum())
    acc = 100.0 * correct / len(val_y)
    return {"curve": curve, "acc": acc}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--methods", type=str, default="crd,simkd,semckd")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--teacher_epochs", type=int, default=TEACHER_EPOCHS)
    p.add_argument("--train_n", type=int, default=512)
    p.add_argument("--val_n", type=int, default=500)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--chaos", type=str, default="crd",
                   help="methods to also chaos-floor (comma list or '')")
    p.add_argument("--chaos_replicates", type=int, default=1,
                   help="independent 1e-7 nudges (distinct element + "
                        "sign) — a floor DISTRIBUTION, not one sample "
                        "(VERDICT r4 next #5)")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    train_x, train_y = make_task(a.train_n, seed=1, noise=a.noise)
    val_x, val_y = make_task(a.val_n, seed=2, noise=a.noise)

    print(f"[comparison_convergence] pretraining resnet32x4 teacher "
          f"({a.teacher_epochs} epochs)...", flush=True)
    teacher = pretrain_teacher(train_x, train_y, val_x, val_y,
                               epochs=a.teacher_epochs)

    out = {}
    chaos_set = set(a.chaos.split(",")) if a.chaos else set()
    for method in a.methods.split(","):
        print(f"[{method}] reference run...", flush=True)
        ref = run_reference(method, teacher, train_x, train_y, val_x,
                            val_y, a.epochs)
        print(f"[{method}] reference acc {ref['acc']:.2f}; ours...",
              flush=True)
        ours = run_ours(method, ref, train_x, train_y, val_x, val_y,
                        a.epochs)
        row = {"ref_acc": ref["acc"], "our_acc": ours["acc"],
               "gap_pts": round(ours["acc"] - ref["acc"], 3)}
        rc = np.array([sum(c) for c in ref["curve"]])
        oc = np.array([sum(c) for c in ours["curve"]])
        row["loss_corr"] = round(float(np.corrcoef(rc, oc)[0, 1]), 5)
        row["median_step_drift"] = round(float(np.median(
            np.abs(oc - rc) / (np.abs(rc) + 1e-9))), 5)
        if method in chaos_set:
            floors = []
            for r in range(a.chaos_replicates):
                sign = 1.0 if r % 2 == 0 else -1.0
                idx = [0, 101, 57, 233, 11, 305, 178][r % 7]
                print(f"[{method}] chaos-floor run {r + 1}/"
                      f"{a.chaos_replicates} (idx={idx}, "
                      f"{sign:+.0f}1e-7)...", flush=True)
                ch = run_reference(method, teacher, train_x, train_y,
                                   val_x, val_y, a.epochs,
                                   perturb=sign * 1e-7, perturb_idx=idx)
                floors.append(round(abs(ch["acc"] - ref["acc"]), 3))
            row["chaos_floor_pts"] = max(floors)
            row["chaos_floors"] = floors
        out[method] = row
        print(f"[{method}] {row}", flush=True)

    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
