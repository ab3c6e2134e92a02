"""Diagnose the flagship-accuracy plateau: fresh-init effiB0@512 on the
synthetic histo-scale task, CE-only (vanilla step), logging train acc /
loss_cls per epoch.  Separates 'MoMA wiring broken' from 'fresh-init
effiB0 cannot optimize this task at this horizon' (the canonical run
starts from PANDA-pretrained trunks — run_moma.sh --std_pre/--tec_pre —
so a pretrained-trunk protocol is the faithful fallback).

  python scripts/diag_flagship_task.py [--epochs 15] [--ra 1] [--lr 0.05]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--train_n", type=int, default=1024)
    p.add_argument("--val_n", type=int, default=256)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--ra", type=int, default=1, help="1=full RA, 0=crop/flip only")
    a = p.parse_args(argv)

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import flagship_accuracy as fa
    from moma_tpu.core.config import Config
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.histo_augment import make_histo_augment, make_histo_eval
    from moma_tpu.models import create_model
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    B, HW = fa.B, fa.HW
    train_x, train_y = fa.make_task(a.train_n, seed=1, noise=a.noise)
    val_x, val_y = fa.make_task(a.val_n, seed=2, noise=a.noise)
    n_steps = a.train_n // B

    cfg = Config()
    cfg.data.dataset = "prostate_hv"
    cfg.data.batch_size = B
    cfg.data.image_size = HW
    if not a.ra:
        cfg.data.aug_train = "NULL"  # RA off (crop/flip/normalize only)
    cfg.model_s.n_cls = fa.N_CLS

    mesh = create_mesh()
    model = create_model("effiB0", num_classes=fa.N_CLS, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, HW, HW, 3), jnp.bfloat16),
                           train=False)
    tx = make_sgd(lr_schedule(a.lr, a.epochs, n_steps, cosine=True),
                  0.9, 1e-4)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_vanilla_train_step(
        augment_fn=make_histo_augment(cfg), donate=False)

    train_x_dev = jax.device_put(train_x, data_sharding(mesh))
    train_y_dev = jax.device_put(train_y, data_sharding(mesh, ndim=1))
    val_x_dev = jax.device_put(val_x, data_sharding(mesh))

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

    perm_rs = np.random.RandomState(4242)
    t0 = time.perf_counter()
    for epoch in range(a.epochs):
        ex, ey = permute(train_x_dev, train_y_dev,
                         jnp.asarray(perm_rs.permutation(a.train_n)))
        accs, losses = [], []
        for i in range(n_steps):
            batch = {"image": ex[i * B:(i + 1) * B],
                     "label": ey[i * B:(i + 1) * B]}
            state, m = step_fn(state, batch,
                               jax.random.PRNGKey(epoch * 10_000 + i))
            accs.append(m["acc1"]); losses.append(m["loss"])
        tr_acc = float(np.mean([float(v) for v in accs]))
        tr_loss = float(np.mean([float(v) for v in losses]))
        correct = 0
        for i in range(0, a.val_n, 64):
            correct += int(eval_correct(
                state.params, state.batch_stats,
                val_x_dev[i:i + 64], jnp.asarray(val_y[i:i + 64])))
        print(f"  ep {epoch + 1}/{a.epochs}: train loss {tr_loss:.4f} "
              f"acc {tr_acc:.1f} | val {100.0 * correct / a.val_n:.2f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
