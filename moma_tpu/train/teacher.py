"""Supervised teacher/vanilla-student training — the train_teacher.py
capability (reference train_teacher.py:146-366), TPU-native.

One function, `run_teacher(cfg)`, drives: mesh + state construction, the
per-epoch train/val/test cycle, best-acc/best-F1 checkpoints, JSON stats,
and full-state resume (which the reference lacks).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.checkpoint import CheckpointManager, StatsWriter
from moma_tpu.core import jitopt
from moma_tpu.core.config import Config
from moma_tpu.core.mesh import create_mesh, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data import augment as aug
from moma_tpu.data.cifar import cifar100_available, load_cifar100
from moma_tpu.data.pipeline import Loader, synthetic_dataset
from moma_tpu.models import create_model
from moma_tpu.train.loop import evaluate, train_one_epoch
from moma_tpu.train.state import TrainState, make_sgd
from moma_tpu.train.steps import make_eval_step, make_vanilla_train_step


def build_datasets(cfg: Config, synthetic: bool = False):
    d = cfg.data
    if d.fold_idx >= 0 and (
        synthetic or d.dataset in ("synthetic", "cifar100")
    ):
        # k-fold re-splits the manifest train+val pool (data/histo.py);
        # synthetic/cifar have no manifests — accepting the flag there
        # would silently train on the native splits under a fold name
        raise ValueError(
            f"--fold_idx applies to file-backed histo/imagefolder datasets, "
            f"not '{d.dataset}'"
        )
    if synthetic or d.dataset == "synthetic":
        n_cls = cfg.model_s.n_cls
        train = synthetic_dataset(
            max(d.batch_size * 4, 256), d.image_size, n_cls, seed=cfg.run.seed
        )
        test = synthetic_dataset(
            max(d.batch_size * 2, 128), d.image_size, n_cls, seed=cfg.run.seed + 1
        )
        return train, test, test
    if d.dataset == "cifar100":
        if not cifar100_available(d.data_dir):
            raise FileNotFoundError(
                f"CIFAR-100 not found under {d.data_dir}; pass --synthetic for smoke runs"
            )
        train, test = load_cifar100(d.data_dir)
        return train, test, test  # reference validates on the test split
    from moma_tpu.data.histo import load_histo_dataset  # lazy; file-backed

    return load_histo_dataset(d)


def augment_fns(cfg: Config):
    d = cfg.data
    if d.dataset == "cifar100" or (d.dataset == "synthetic" and d.image_size == 32):
        return aug.cifar_train_augment, aug.cifar_eval_normalize
    # histo/imagenet-style stacks; RandAugment stage added at the histo milestone
    from moma_tpu.data.histo_augment import make_histo_augment, make_histo_eval

    return make_histo_augment(cfg), make_histo_eval(cfg)


def run_teacher(cfg: Config, synthetic: bool = False, max_steps_per_epoch: int = 0):
    run_dir = os.path.join(cfg.run.save_dir, f"teacher_{cfg.run_name}")
    os.makedirs(run_dir, exist_ok=True)
    stats = StatsWriter(run_dir)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))

    if cfg.run.model_parallel > 1:
        # supervised training has no 'model'-axis operand; accepting the
        # flag would silently halve the data axis instead of sharding
        raise ValueError(
            "--model_parallel > 1 is only wired for --distill moma (it "
            "shards the negative queue); teacher training is pure "
            "data-parallel"
        )
    if cfg.run.bn != "global":
        # only the MoMA step has the shard_map execution path; accepting
        # the flag here would silently train with global-batch BN
        raise ValueError(
            f"--bn {cfg.run.bn} is only wired for --distill moma "
            "(shard_map per-device execution); teacher training runs "
            "jitted global-batch BN"
        )
    if (cfg.run.sequence_parallel or cfg.run.teacher_parallel != "tensor"
            or cfg.run.pp_microbatch):
        # the SP/PP machinery lives on the MoMA ViT KL-teacher; accepting
        # these here would be a silent no-op
        raise ValueError(
            "--sequence_parallel / --teacher_parallel pipeline / "
            "--pp_microbatch apply to the MoMA cross-arch ViT teacher "
            "(--distill moma); teacher training has no model parallelism"
        )
    jitopt.set_scoped_vmem(cfg.run.scoped_vmem_kib)
    mesh = create_mesh(model_parallel=cfg.run.model_parallel)
    n_cls = cfg.model_s.n_cls
    dtype = jnp.bfloat16 if cfg.run.half_precision else None
    model = create_model(cfg.model_s.name, num_classes=n_cls, dtype=dtype)

    train_ds, val_ds, test_ds = build_datasets(cfg, synthetic)
    train_loader = Loader(train_ds, cfg.data.batch_size, train=True,
                          seed=cfg.run.seed, num_workers=cfg.data.num_workers)
    val_loader = Loader(val_ds, cfg.data.eval_batch_size, train=False,
                        num_workers=cfg.data.num_workers)
    test_loader = Loader(test_ds, cfg.data.eval_batch_size, train=False,
                         num_workers=cfg.data.num_workers)

    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    rng = jax.random.PRNGKey(cfg.run.seed)
    init_rng, train_rng = jax.random.split(rng)
    sample = jnp.zeros(
        (2, cfg.data.image_size, cfg.data.image_size, 3),
        jnp.bfloat16 if dtype else jnp.float32,
    )
    variables = model.init(init_rng, sample, train=False)

    if cfg.model_s.pretrain:
        from moma_tpu.models.pretrained import load_pretrained_params

        variables = load_pretrained_params(
            variables, cfg.model_s.pretrain, strict=cfg.model_s.strict
        )

    tx = make_sgd(
        lr_schedule(
            cfg.optim.learning_rate,
            cfg.run.epochs,
            steps_per_epoch,
            cosine=cfg.optim.cosine,
            decay_rate=cfg.optim.lr_decay_rate,
            decay_epochs=cfg.optim.lr_decay_epochs,
            warmup_epochs=cfg.optim.warmup_epochs,
        ),
        momentum=cfg.optim.momentum,
        weight_decay=cfg.optim.weight_decay,
        nesterov=cfg.optim.nesterov,
        grad_clip=cfg.optim.grad_clip,
        trust_ratio=cfg.optim.trust_ratio,
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    state = jax.device_put(state, replicated_sharding(mesh))

    start_epoch = 1
    resumed_best_acc = resumed_best_f1 = -1.0
    if cfg.run.resume and ckpt.exists("latest"):
        restorable = {"params": state.params, "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state, "step": state.step}
        restored = ckpt.restore("latest", restorable)
        state = state.replace(**restored)
        meta = ckpt.meta("latest") or {}
        start_epoch = int(meta.get("epoch", 0)) + 1
        # exact mid-epoch resume: a preempted partial epoch recorded how
        # many of its batches ran; the loader's deterministic shuffle +
        # per-index RNG folding make the continuation bit-identical to
        # the uninterrupted epoch (tests/test_midepoch_resume.py)
        resume_step = int(meta.get("resume_step", 0))
        # best thresholds survive the restart — else the first post-resume
        # epoch overwrites the real best_acc/best_f1 checkpoints
        m_acc, m_f1 = ckpt.meta("best_acc"), ckpt.meta("best_f1")
        if m_acc is not None:
            resumed_best_acc = float(m_acc.get("val_acc", -1.0))
        if m_f1 is not None:
            resumed_best_f1 = float(m_f1.get("val_f1", -1.0))
        print(f"[resume] from epoch {start_epoch}"
              + (f" step {resume_step}" if resume_step else "")
              + f" (best_acc={resumed_best_acc:.2f}, "
                f"best_f1={resumed_best_f1:.4f})")
    else:
        resume_step = 0

    train_aug, eval_norm = augment_fns(cfg)
    step_fn = make_vanilla_train_step(augment_fn=train_aug, donate=cfg.run.donate,
                                      grad_accum=cfg.run.grad_accum,
                                      remat=cfg.run.remat)
    eval_step = make_eval_step(model.apply, n_cls, normalize_fn=eval_norm)

    if cfg.run.preflight_eval:
        # reference --skip_validation (inverted store_false flag): check
        # the loaded/pretrained model on the test split before training
        # (train_teacher.py:230-241)
        pre = evaluate(state.params, state.batch_stats, test_loader,
                       eval_step, mesh, n_cls)
        print(f"[pre-flight] model test acc {pre['acc']:.2f} "
              f"f1 {pre['f1']:.4f}")

    from moma_tpu.core.preempt import GracefulStop
    from moma_tpu.train.loop import NonFiniteLossError

    best_acc, best_f1 = resumed_best_acc, resumed_best_f1
    t_start = time.time()
    import contextlib

    with GracefulStop() as stop_guard:
        for epoch in range(start_epoch, cfg.run.epochs + 1):
            if cfg.run.profile_dir and epoch == start_epoch:
                from moma_tpu.core.profiling import trace

                ctx = trace(cfg.run.profile_dir)
            else:
                ctx = contextlib.nullcontext()
            ep_start = resume_step if epoch == start_epoch else 0
            try:
                with ctx:
                    state, tr = train_one_epoch(
                        state, train_loader, step_fn, mesh, epoch, train_rng,
                        print_freq=cfg.run.print_freq, log_fn=stats.scalar,
                        stop=stop_guard, start_step=ep_start,
                    )
            except NonFiniteLossError as e:
                # failure detection: exit cleanly; 'latest' (end of the
                # last finite epoch) is the resume point
                print(f"[nan-guard] {e}; stopping — resume from the last "
                      f"epoch-end checkpoint (epoch {epoch - 1})")
                stats.update_epoch(epoch, {"nan_aborted": True})
                ckpt.wait()  # flush in-flight async save + meta
                return state, {"best_acc": best_acc, "best_f1": best_f1,
                               "run_dir": run_dir, "nan_aborted": True}
            if stop_guard.stopping:
                # preemption: persist full state + the exact batch index,
                # so --resume continues this epoch mid-flight instead of
                # redoing it (bit-identical to the uninterrupted run)
                save_state = {"params": state.params, "batch_stats": state.batch_stats,
                              "opt_state": state.opt_state, "step": state.step}
                # resume_step == len(loader) (stop landed on the epoch's
                # last batch) resumes into 0 remaining batches and goes
                # straight to the epoch's eval/bookkeeping — the epoch's
                # updates are never applied twice
                meta = {"epoch": epoch - 1, "preempted": True,
                        "resume_step": tr["steps"]}
                ckpt.save("latest", save_state, meta)
                print(f"[preempt] checkpointed at epoch {epoch} step "
                      f"{tr['steps']}/{len(train_loader)}; exiting")
                return state, {"best_acc": best_acc, "best_f1": best_f1,
                               "run_dir": run_dir, "preempted": True}
            val = evaluate(state.params, state.batch_stats, val_loader, eval_step, mesh, n_cls)
            row = {
                "train_loss": tr["loss"], "train_acc": tr["acc1"],
                "ips": tr["ips"], "val_loss": val["loss"], "val_acc": val["acc"],
                "val_f1": val["f1"],
            }
            if ep_start:
                # resumed epoch: train stats cover only batches
                # [ep_start, n) — flag so the row isn't read as a full
                # epoch average
                row["train_partial_from"] = ep_start
            if not cfg.run.skip_test:
                test = evaluate(
                    state.params, state.batch_stats, test_loader, eval_step, mesh, n_cls
                )
                row.update(test_loss=test["loss"], test_acc=test["acc"], test_f1=test["f1"])
            stats.update_epoch(epoch, row)
            print(
                f"epoch {epoch}: train loss {tr['loss']:.4f} acc {tr['acc1']:.2f} | "
                f"val acc {val['acc']:.2f} f1 {val['f1']:.4f} | {tr['ips']:.1f} img/s"
            )

            save_state = {"params": state.params, "batch_stats": state.batch_stats,
                          "opt_state": state.opt_state, "step": state.step}
            meta = {"epoch": epoch, **{k: v for k, v in row.items() if k != "conf_mat"}}
            # async: the disk commit overlaps the next epoch's compute;
            # meta sidecars land at the next ckpt op / final wait()
            ckpt.save("latest", save_state, meta, block=False)
            if val["acc"] > best_acc:
                best_acc = val["acc"]
                ckpt.save("best_acc", save_state, meta, block=False)
            if val["f1"] > best_f1:
                best_f1 = val["f1"]
                ckpt.save("best_f1", save_state, meta, block=False)

    ckpt.wait()  # commit the final epoch's async saves + meta sidecars
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    stats.write_params_json(
        run_dir,
        {
            "config": cfg.to_json(),
            "num_params_M": n_params / 1e6,
            "best_val_acc": best_acc,
            "best_val_f1": best_f1,
            "hours": (time.time() - t_start) / 3600.0,
        },
    )
    return state, {"best_acc": best_acc, "best_f1": best_f1, "run_dir": run_dir}
