"""Converged-accuracy parity AT THE CANONICAL SCALE (VERDICT r3 next #1).

Every accuracy study before round 4 ran resnet8 / B=8 / K=64; the
reference's product is effiB0 students at 512x512, global batch 128,
K=16384, mlp head + self attention, full RandAugment
(/root/reference/scripts/run_moma.sh:6-10, train_student_moma.py:100-136).
This harness runs OUR MoMA loop at exactly that configuration — the same
step/config surface bench.py's headline uses, including the exact-BN
epoch dispatch of run_moma — on a learnable synthetic histo-scale task,
three ways on the real chip:

  bf16   the SHIPPED default (half_precision compute policy)
  f32    the control (with remat: identical math, recompute instead of
         storing f32 activations — BS128@512 f32 without remat risks HBM)
  chaos  f32 with a 1e-7 nudge on ONE weight — the f32 trajectory-chaos
         floor that makes any bf16-vs-f32 gap interpretable

PRETRAINED TRUNKS (r4): the reference never trains effiB0 from scratch
— run_moma.sh loads --std_pre/--tec_pre PANDA checkpoints into both
nets — so this harness first pretrains ONE effiB0 on the task (vanilla
CE, aug NULL; the pretrain protocol is ours, as PANDA pretraining was
the reference's own prior pipeline), caches the weights, and starts
every leg from them: teacher = full pretrained, student = pretrained
trunk + fresh classifier (the strict=False classifier-popping semantics
of helper/util.py:156-159).  This also puts the measured legs at stable
convergence, where parity claims are meaningful (CLAUDE.md chaos lore).

TASK DESIGN (r4, measured): see make_task — the old fixed-color-template
task is unlearnable-or-memorizable under the canonical full-RA recipe
(fresh effiB0 collapses to the class prior with RA; without RA it
memorizes the 1024 fixed noise instances at train CE 1e-4 / val chance).
The orientation x frequency texture task is RA-invariant by construction
and fresh effiB0 learns it under full RA (81% train acc by epoch 3 at
64^2 on CPU).

Feeding: the train/val sets live DEVICE-RESIDENT (one upload); per-epoch
permutation happens on device and losses are fetched once per epoch —
the axon relay never enters the timed path (CLAUDE.md).

  python scripts/flagship_accuracy.py [--epochs 30] [--train_n 1024]
         [--noise 0.3] [--runs bf16,f32,chaos] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, HW, N_CLS, FEAT, K = 128, 512, 4, 512, 16384
LR, MOM, WD, ALPHA, T_NCE, KD_T = 0.05, 0.9, 1e-4, 0.999, 0.15, 4.0


def make_task(n: int, seed: int, noise: float):
    """Learnable-under-RandAugment histo-scale task (r4 redesign).

    The r2/r3 template task (fixed color templates + noise) is NOT
    RA-compatible: its class signal is absolute color structure, which
    is precisely what RA's color ops (solarize/posterize/equalize/
    invert/contrast) destroy — measured: resnet8 crawls to ~77% under
    RA while effiB0 collapses to the class prior, and without RA
    effiB0 memorizes the fixed templates' noise instead (train CE 1e-4,
    val chance).  Classes here are {coarse, fine} x {horizontal,
    vertical} oriented sinusoid textures with PER-SAMPLE random phase/
    frequency jitter: the class rule is a spatial-frequency statistic —
    invariant to every RA color op, robust to its geometry (rotate/shear
    at m10 stay <=30 deg: h/v remain separable; the 6x frequency ratio
    dwarfs crop-induced rescaling) — and no fixed template exists, so
    generalization is forced.  uint8, the real pipeline's input dtype."""
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, N_CLS, (n,)).astype(np.int32)
    freqs = (4.0, 4.0, 24.0, 24.0)   # cycles/image: coarse, coarse, fine, fine
    vertical = (0, 1, 0, 1)          # stripe direction
    u = np.arange(HW, dtype=np.float32)
    x = np.empty((n, HW, HW, 3), np.uint8)
    for i in range(n):
        c = int(labels[i])
        f = freqs[c] * (1.0 + 0.25 * (rs.rand() - 0.5))
        wave = 0.5 + 0.45 * np.sin(
            2.0 * np.pi * f * u / HW + rs.rand() * 2.0 * np.pi)
        img = wave[None, :] if vertical[c] else wave[:, None]
        img = np.broadcast_to(img[..., None], (HW, HW, 3))
        mix = ((1.0 - noise) * img
               + noise * rs.rand(HW, HW, 3).astype(np.float32))
        x[i] = (mix * 255.0 + 0.5).astype(np.uint8)
    return x, labels


# task-version tag: bump when make_task or the pretrain protocol changes
TASK_VERSION = "r4-orientfreq-v2"


def _pretrain_cache_path(epochs, train_n, noise):
    # keyed on everything that changes the produced weights — a stale
    # cache from a different pretrain config must never be loaded
    return (f"/tmp/flagship_pretrain_{TASK_VERSION}"
            f"_e{epochs}_n{train_n}_noise{noise}.pkl")


def pretrain_trunk(train_x, train_y, val_x, val_y, epochs: int = 10,
                   log=print, noise: float = 0.3):
    """Vanilla-CE effiB0 pretrain on the task (aug NULL, bf16 compute,
    SGD 0.05 cosine) — the study's stand-in for the reference's PANDA
    pretrain.  Cached (keyed on epochs/train_n/noise/task version) so
    every leg and runner process starts from the identical f32 weights."""
    import pickle

    cache = _pretrain_cache_path(epochs, len(train_y), noise)
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)

    import jax
    import jax.numpy as jnp

    from moma_tpu.core.config import Config
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.histo_augment import (make_histo_augment,
                                             make_histo_eval)
    from moma_tpu.models import create_model
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = B
    cfg.data.image_size = HW
    cfg.data.aug_train = "NULL"  # crop/flip/normalize only (see docstring)
    cfg.model_s.n_cls = N_CLS

    mesh = create_mesh()
    model = create_model("effiB0", num_classes=N_CLS, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, HW, HW, 3), jnp.bfloat16),
                           train=False)
    n_steps = len(train_y) // B
    tx = make_sgd(lr_schedule(LR, epochs, n_steps, cosine=True), MOM, WD)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_vanilla_train_step(
        augment_fn=make_histo_augment(cfg), donate=False)

    tx_dev = jax.device_put(train_x, data_sharding(mesh))
    ty_dev = jax.device_put(train_y, data_sharding(mesh, ndim=1))
    vx_dev = jax.device_put(val_x, data_sharding(mesh))

    @jax.jit
    def permute(x, y, perm):
        return jnp.take(x, perm, axis=0), jnp.take(y, perm, axis=0)

    eval_norm = make_histo_eval(cfg)

    @jax.jit
    def eval_correct(params, bs, images, labels):
        _, logits = model.apply({"params": params, "batch_stats": bs},
                                eval_norm(images), train=False)
        return jnp.sum((jnp.argmax(logits.astype(jnp.float32), -1)
                        == labels).astype(jnp.int32))

    perm_rs = np.random.RandomState(1717)
    val_y_np = np.asarray(val_y)
    acc = 0.0
    for epoch in range(epochs):
        ex, ey = permute(tx_dev, ty_dev,
                         jnp.asarray(perm_rs.permutation(len(train_y))))
        losses = []
        for i in range(len(train_y) // B):
            batch = {"image": ex[i * B:(i + 1) * B],
                     "label": ey[i * B:(i + 1) * B]}
            state, m = step_fn(state, batch,
                               jax.random.PRNGKey(epoch * 777 + i))
            losses.append(m["loss"])
        ep_loss = float(np.mean([float(v) for v in losses]))
        correct = 0
        for i in range(0, len(val_y_np), 64):
            correct += int(eval_correct(
                state.params, state.batch_stats, vx_dev[i:i + 64],
                jnp.asarray(val_y_np[i:i + 64])))
        acc = 100.0 * correct / len(val_y_np)
        log(f"  [pretrain] epoch {epoch + 1}/{epochs}: loss {ep_loss:.4f} "
            f"val acc {acc:.2f}", flush=True)

    # BN running-stat recalibration: effiB0's BN momentum is 0.99 (TF
    # default the torch port keeps), so the short pretrain's ~80 steps
    # leave running stats ~half init values and eval-mode forwards are
    # garbage (measured: val erratic 20->63->24 while train CE 5e-4).
    # Converge them with forward-only train-mode passes (0.99^320 ~ 4%
    # residual) — the reference's 50-epoch runs get this for free.
    augment_fn = make_histo_augment(cfg)

    @jax.jit
    def bn_refresh(params, bs, images, rng):
        _, mut = model.apply(
            {"params": params, "batch_stats": bs}, augment_fn(images, rng),
            train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    bs = state.batch_stats
    n_steps_ep = len(train_y) // B
    for r in range(320):
        i = r % n_steps_ep
        bs = bn_refresh(state.params, bs,
                        tx_dev[i * B:(i + 1) * B],
                        jax.random.PRNGKey(31_000 + r))
    state = state.replace(batch_stats=bs)
    jax.block_until_ready(bs)
    correct = 0
    for i in range(0, len(val_y_np), 64):
        correct += int(eval_correct(
            state.params, state.batch_stats, vx_dev[i:i + 64],
            jnp.asarray(val_y_np[i:i + 64])))
    acc = 100.0 * correct / len(val_y_np)
    log(f"  [pretrain] post-BN-recalibration val acc {acc:.2f}",
        flush=True)

    out = {
        "params": jax.tree_util.tree_map(
            lambda a: np.asarray(a), jax.device_get(state.params)),
        "batch_stats": jax.tree_util.tree_map(
            lambda a: np.asarray(a), jax.device_get(state.batch_stats)),
        "val_acc": acc,
    }
    with open(cache, "wb") as f:
        pickle.dump(out, f)
    return out


def run(precision: str, train_x, train_y, val_x, val_y, epochs: int,
        perturb: float = 0.0, log=print, pretrained=None):
    import jax
    import jax.numpy as jnp

    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.histo_augment import (make_histo_augment,
                                             make_histo_eval)
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    bf16 = precision == "bf16"
    dtype = jnp.bfloat16 if bf16 else None
    n_steps = len(train_y) // B

    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = B
    cfg.data.image_size = HW
    cfg.run.half_precision = bf16
    # f32 activations at BS128@512 overflow HBM; PER-BLOCK remat
    # (EfficientNet.block_remat) recomputes each MBConv interior in the
    # backward — same ops, same values, pure memory lever (the coarse
    # full-forward cfg.run.remat measured ineffective: the replay still
    # materializes the whole activation set; the bf16 run stays the
    # shipped default: no remat)
    cfg.run.remat = False
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          kl_teacher_bn="exact")
    from moma_tpu.core.config import ModelConfig
    cfg.model_s = ModelConfig(name="effiB0", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="effiB0", n_cls=N_CLS)

    mesh = create_mesh()
    model = create_model("effiB0", num_classes=N_CLS, dtype=dtype,
                         block_remat=not bf16)
    sample = jnp.zeros((2, HW, HW, 3), dtype or jnp.float32)
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)
    if pretrained is not None:
        # teacher = full pretrained net; student = pretrained trunk +
        # fresh classifier (strict=False classifier-popping semantics,
        # helper/util.py:156-159) — run_moma.sh --std_pre/--tec_pre
        pt_params = jax.tree_util.tree_map(jnp.asarray,
                                           pretrained["params"])
        pt_bs = jax.tree_util.tree_map(jnp.asarray,
                                       pretrained["batch_stats"])
        vars_t = {"params": pt_params, "batch_stats": pt_bs}
        s_params = dict(pt_params)
        s_params["classifier"] = vars_s["params"]["classifier"]
        vars_s = {"params": s_params, "batch_stats": pt_bs}
    if perturb:
        flat, tree = jax.tree_util.tree_flatten(vars_s["params"])
        flat[0] = flat[0].at[(0,) * flat[0].ndim].add(perturb)
        vars_s = dict(vars_s, params=jax.tree_util.tree_unflatten(tree, flat))
    fs, _ = probe_shapes(model, HW, 2)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=s_dim,
                     t_dim=s_dim, dtype=dtype)
    cmo_params, cmo_bs = heads.init(jax.random.PRNGKey(2))
    queue = QueueState.create(jax.random.PRNGKey(3), K, FEAT)
    # canonical LR shape: cosine over the study's horizon (run_moma.sh
    # trains cosine-to-zero over its 50 epochs)
    tx = make_sgd(lr_schedule(LR, epochs, n_steps, cosine=True), MOM, WD)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=_teacher_apply(cfg, model),
    )
    state = jax.device_put(state, replicated_sharding(mesh))

    augment = make_histo_augment(cfg)
    # run_moma's exact-BN schedule: eval-BN teacher KL on each epoch's
    # first batch, train-BN after (train/moma.py kl_train_bn_override)
    step_first = make_moma_train_step(cfg, heads, augment, donate=False,
                                      kl_train_bn_override=False)
    step_rest = make_moma_train_step(cfg, heads, augment, donate=False,
                                     kl_train_bn_override=True)

    train_x_dev = jax.device_put(train_x, data_sharding(mesh))
    train_y_dev = jax.device_put(train_y, data_sharding(mesh, ndim=1))
    val_x_dev = jax.device_put(val_x, data_sharding(mesh))

    @jax.jit
    def permute(x, y, perm):
        return jnp.take(x, perm, axis=0), jnp.take(y, perm, axis=0)

    eval_norm = make_histo_eval(cfg)

    @jax.jit
    def eval_correct(params, bs, images, labels):
        _, logits = model.apply(
            {"params": params, "batch_stats": bs}, eval_norm(images),
            train=False)
        return jnp.sum((jnp.argmax(logits.astype(jnp.float32), -1)
                        == labels).astype(jnp.int32))

    perm_rs = np.random.RandomState(4242)  # identical batch order per run
    val_y_np = np.asarray(val_y)
    curve, accs = [], []
    t0 = time.perf_counter()
    for epoch in range(epochs):
        ex, ey = permute(train_x_dev, train_y_dev,
                         jnp.asarray(perm_rs.permutation(len(train_y))))
        ep_losses, ep_cls, ep_acc = [], [], []
        for i in range(n_steps):
            batch = {"image": ex[i * B:(i + 1) * B],
                     "label": ey[i * B:(i + 1) * B]}
            fn = step_first if i == 0 else step_rest
            state, metrics = fn(state, batch,
                                jax.random.PRNGKey(epoch * 10_000 + i))
            ep_losses.append(metrics["loss"])
            ep_cls.append(metrics["loss_cls"])
            ep_acc.append(metrics["acc1"])
        # one value fetch per epoch forces the whole chain (CLAUDE.md)
        ep = [float(v) for v in ep_losses]
        cls_m = float(np.mean([float(v) for v in ep_cls]))
        acc_m = float(np.mean([float(v) for v in ep_acc]))
        curve.extend(ep)
        correct = 0
        for i in range(0, len(val_y_np), 64):
            correct += int(eval_correct(
                state.params["student"], state.batch_stats["student"],
                val_x_dev[i:i + 64], jnp.asarray(val_y_np[i:i + 64])))
        acc = 100.0 * correct / len(val_y_np)
        accs.append(acc)
        log(f"  [{precision}{'+chaos' if perturb else ''}] epoch "
            f"{epoch + 1}/{epochs}: loss {np.mean(ep):.4f} "
            f"cls {cls_m:.4f} train acc {acc_m:.1f} "
            f"val acc {acc:.2f}", flush=True)
    # final BN recalibration before the reported eval: at this horizon
    # (160 steps, BN momentum 0.99) the student's running stats are
    # mid-transient between the RA-augmented train distribution and
    # their pretrain values — measured: train acc 89% with eval-mode
    # val pinned at the constant-class 27.3% until recalibrated.  The
    # reference's 40k-step canonical runs converge these for free.
    @jax.jit
    def bn_refresh(params, bs, images, rng):
        _, mut = model.apply(
            {"params": params, "batch_stats": bs}, augment(images, rng),
            train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    sbs = state.batch_stats["student"]
    for r in range(320):
        i = r % n_steps
        sbs = bn_refresh(state.params["student"], sbs,
                         train_x_dev[i * B:(i + 1) * B],
                         jax.random.PRNGKey(77_000 + r))
    correct = 0
    for i in range(0, len(val_y_np), 64):
        correct += int(eval_correct(
            state.params["student"], sbs,
            val_x_dev[i:i + 64], jnp.asarray(val_y_np[i:i + 64])))
    final_acc = 100.0 * correct / len(val_y_np)
    log(f"  [{precision}{'+chaos' if perturb else ''}] post-BN-"
        f"recalibration val acc {final_acc:.2f}", flush=True)

    wall = time.perf_counter() - t0
    ips = epochs * n_steps * B / wall
    return {"curve": curve, "accs": accs, "final_acc": final_acc,
            "raw_final_acc": accs[-1], "raw_accs": accs,
            "best_acc": max(accs + [final_acc]),
            "img_per_s": round(ips, 1), "remat": cfg.run.remat}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--pretrain_epochs", type=int, default=10)
    p.add_argument("--train_n", type=int, default=1024)
    p.add_argument("--val_n", type=int, default=512)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--runs", type=str, default="bf16,f32,chaos")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"[flagship_accuracy] effiB0@{HW}, global BS{B}, K={K}, "
          f"mlp/self, full RA, exact-BN; task: {a.train_n} train / "
          f"{a.val_n} val, noise {a.noise}", flush=True)
    train_x, train_y = make_task(a.train_n, seed=1, noise=a.noise)
    val_x, val_y = make_task(a.val_n, seed=2, noise=a.noise)

    pt = pretrain_trunk(train_x, train_y, val_x, val_y,
                        epochs=a.pretrain_epochs, noise=a.noise)
    print(f"[flagship_accuracy] pretrained trunk val acc "
          f"{pt['val_acc']:.2f}", flush=True)

    out = {"config": {"model": "effiB0", "hw": HW, "B": B, "K": K,
                      "feat_dim": FEAT, "epochs": a.epochs,
                      "train_n": a.train_n, "val_n": a.val_n,
                      "noise": a.noise, "lr": LR, "cosine": True,
                      "pretrain_epochs": a.pretrain_epochs,
                      "pretrain_val_acc": pt["val_acc"]}}
    for name in a.runs.split(","):
        t0 = time.perf_counter()
        if name == "bf16":
            out["bf16"] = run("bf16", train_x, train_y, val_x, val_y,
                              a.epochs, pretrained=pt)
        elif name == "f32":
            out["f32"] = run("f32", train_x, train_y, val_x, val_y,
                             a.epochs, pretrained=pt)
        elif name == "chaos":
            out["chaos"] = run("f32", train_x, train_y, val_x, val_y,
                               a.epochs, perturb=1e-7, pretrained=pt)
        else:
            raise SystemExit(f"unknown run {name!r}")
        print(f"[flagship_accuracy] {name}: final acc "
              f"{out[name]['final_acc']:.2f} best {out[name]['best_acc']:.2f} "
              f"({out[name]['img_per_s']} img/s incl. eval; "
              f"{time.perf_counter() - t0:.0f}s wall)", flush=True)

    if "bf16" in out and "f32" in out:
        n = min(len(out["bf16"]["curve"]), len(out["f32"]["curve"]))
        corr = float(np.corrcoef(out["bf16"]["curve"][:n],
                                 out["f32"]["curve"][:n])[0, 1])
        out["bf16_vs_f32"] = {
            "acc_gap_pts": round(out["bf16"]["final_acc"]
                                 - out["f32"]["final_acc"], 3),
            "loss_corr": round(corr, 5),
        }
    if "chaos" in out and "f32" in out:
        out["chaos_floor_pts"] = round(
            abs(out["chaos"]["final_acc"] - out["f32"]["final_acc"]), 3)
    print(json.dumps({k: v for k, v in out.items()
                      if k in ("bf16_vs_f32", "chaos_floor_pts")} |
                     {k: {"final_acc": v["final_acc"],
                          "best_acc": v["best_acc"]}
                      for k, v in out.items()
                      if isinstance(v, dict) and "final_acc" in v},
                     indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
