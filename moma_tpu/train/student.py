"""Distillation training driver — the train_student_comparison.py /
train_student_moma.py (non-moma branches) capability.

`run_student(cfg)` builds student+teacher, probes feature shapes,
constructs the distiller aux modules, and drives the epoch loop with one
jitted distill step.  The `moma` method routes to train/moma.py.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.checkpoint import CheckpointManager, StatsWriter
from moma_tpu.core import jitopt
from moma_tpu.core.config import Config
from moma_tpu.core.mesh import create_mesh, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.pipeline import Loader
from moma_tpu.data.sampler import InstanceSampler
from moma_tpu.models import create_model
from moma_tpu.train.distill import Distiller, make_distill_train_step, probe_shapes
from moma_tpu.train.loop import evaluate, train_one_epoch
from moma_tpu.train.state import DistillState, make_sgd
from moma_tpu.train.steps import make_eval_step
from moma_tpu.train.teacher import augment_fns, build_datasets


def _teacher_apply_cfg(cfg: Config, teacher):
    """Honor cfg.moma.teacher_quant for the fixed KD teacher
    (shared validator: core/quantize.py::teacher_apply_for;
    fused_teacher does not exist on this path)."""
    from moma_tpu.core.quantize import teacher_apply_for

    return teacher_apply_for(
        teacher.apply, getattr(cfg.moma, "teacher_quant", "none")
    )


def load_teacher_variables(cfg: Config, model_t, sample, rng):
    """Init + optionally restore teacher weights from --path_t / presets."""
    variables = model_t.init(rng, sample, train=False)
    pre = cfg.model_t.pretrain
    if pre:
        from moma_tpu.models.pretrained import load_pretrained_params

        # resolves paths AND preset tags; raises on an unresolvable tag
        # instead of silently training an un-pretrained teacher.
        variables = load_pretrained_params(
            variables, pre, strict=cfg.model_t.strict
        )
    return variables


def run_student(cfg: Config, synthetic: bool = False):
    if cfg.distill.distill == "moma":
        from moma_tpu.train.moma import run_moma

        return run_moma(cfg, synthetic=synthetic)

    run_dir = os.path.join(cfg.run.save_dir, f"student_{cfg.run_name}")
    os.makedirs(run_dir, exist_ok=True)
    stats = StatsWriter(run_dir)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))

    if cfg.run.model_parallel > 1:
        # nothing in the comparison-distiller step shards over 'model';
        # accepting the flag would silently halve the data axis instead
        raise ValueError(
            "--model_parallel > 1 is only wired for --distill moma (it "
            "shards the negative queue over the 'model' axis); the "
            "comparison distillers are pure data-parallel"
        )
    if cfg.run.bn != "global":
        # only the MoMA step has the shard_map execution path; accepting
        # the flag here would silently train with global-batch BN
        raise ValueError(
            f"--bn {cfg.run.bn} is only wired for --distill moma "
            "(shard_map per-device execution); the comparison distillers "
            "run jitted global-batch BN"
        )
    if (cfg.run.sequence_parallel or cfg.run.teacher_parallel != "tensor"
            or cfg.run.pp_microbatch):
        # the SP/PP machinery lives on the MoMA ViT KL-teacher; accepting
        # these here would be a silent no-op
        raise ValueError(
            "--sequence_parallel / --teacher_parallel pipeline / "
            "--pp_microbatch apply to the MoMA cross-arch ViT teacher "
            "(--distill moma); the comparison distillers replicate their "
            "fixed teacher"
        )
    jitopt.set_scoped_vmem(cfg.run.scoped_vmem_kib)
    mesh = create_mesh(model_parallel=cfg.run.model_parallel)
    n_cls = cfg.model_s.n_cls
    dtype = jnp.bfloat16 if cfg.run.half_precision else None
    student = create_model(cfg.model_s.name, num_classes=n_cls, dtype=dtype)
    teacher = create_model(cfg.model_t.name, num_classes=n_cls, dtype=dtype)

    train_ds, val_ds, test_ds = build_datasets(cfg, synthetic)

    # CRD: class-aware negative sampling on the host, indices ride the batch
    extras = {}
    sampler = None
    if cfg.distill.distill == "crd":
        sampler = InstanceSampler(
            train_ds.labels, k=cfg.moma.nce_k, mode=cfg.moma.mode,
            percent=cfg.data.percent, seed=cfg.run.seed,
        )

    train_loader = Loader(train_ds, cfg.data.batch_size, train=True,
                          seed=cfg.run.seed, num_workers=cfg.data.num_workers)
    val_loader = Loader(val_ds, cfg.data.eval_batch_size, train=False,
                        num_workers=cfg.data.num_workers)
    test_loader = Loader(test_ds, cfg.data.eval_batch_size, train=False,
                         num_workers=cfg.data.num_workers)
    steps_per_epoch = len(train_loader)

    rng = jax.random.PRNGKey(cfg.run.seed)
    init_s, init_t, init_aux, init_extra, train_rng = jax.random.split(rng, 5)
    sample = jnp.zeros(
        (2, cfg.data.image_size, cfg.data.image_size, 3),
        jnp.bfloat16 if dtype else jnp.float32,
    )
    vars_s = student.init(init_s, sample, train=False)
    if cfg.model_s.pretrain:
        from moma_tpu.models.pretrained import load_pretrained_params

        vars_s = load_pretrained_params(
            vars_s, cfg.model_s.pretrain, strict=cfg.model_s.strict
        )
    vars_t = load_teacher_variables(cfg, teacher, sample, init_t)

    feat_s_shapes, _ = probe_shapes(student, cfg.data.image_size, cfg.data.batch_size)
    feat_t_shapes, _ = probe_shapes(teacher, cfg.data.image_size, cfg.data.batch_size)
    distiller = Distiller(
        cfg, feat_s_shapes, feat_t_shapes,
        n_data=len(train_ds), batch_size=cfg.data.batch_size, dtype=dtype,
    )
    aux_params, aux_bs = distiller.init_aux(init_aux)
    extra = distiller.init_extra(init_extra)

    tx = make_sgd(
        lr_schedule(
            cfg.optim.learning_rate, cfg.run.epochs, steps_per_epoch,
            cosine=cfg.optim.cosine, decay_rate=cfg.optim.lr_decay_rate,
            decay_epochs=cfg.optim.lr_decay_epochs,
            warmup_epochs=cfg.optim.warmup_epochs,
        ),
        momentum=cfg.optim.momentum,
        weight_decay=cfg.optim.weight_decay,
        nesterov=cfg.optim.nesterov,
        grad_clip=cfg.optim.grad_clip,
        trust_ratio=cfg.optim.trust_ratio,
    )
    params = {"student": vars_s["params"], "aux": aux_params}
    state = DistillState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"student": vars_s.get("batch_stats", {}), "aux": aux_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t.get("batch_stats", {}),
        opt_state=tx.init(params),
        extra=extra,
        tx=tx,
        apply_fn=student.apply,
        # --teacher_quant int8 applies here too: the comparison
        # distillers' fixed teacher is equally gradient-free (its feats/
        # logits feed losses that only backprop through the student)
        teacher_apply_fn=_teacher_apply_cfg(cfg, teacher),
    )
    state = jax.device_put(state, replicated_sharding(mesh))

    start_epoch = 1
    resumed_best_acc = resumed_best_f1 = -1.0
    if cfg.run.resume and ckpt.exists("latest"):
        restorable = {"params": state.params, "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state, "step": state.step}
        if state.extra is not None:  # CRD memory banks round-trip too
            restorable["extra"] = state.extra
        restored = ckpt.restore("latest", restorable)
        state = state.replace(**restored)
        meta = ckpt.meta("latest") or {}
        start_epoch = int(meta.get("epoch", 0)) + 1
        # exact mid-epoch resume point (see train/teacher.py)
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
    step_fn = make_distill_train_step(distiller, train_aug, donate=cfg.run.donate,
                                      grad_accum=cfg.run.grad_accum,
                                      remat=cfg.run.remat)
    simkd_eval = cfg.distill.distill == "simkd"
    if simkd_eval:
        # SimKD has no trained student classifier (cls weight 0): eval
        # routes pooled transferred features through the REUSED teacher
        # classifier (reference validate_distill, loops_moma.py:481-487)
        from moma_tpu.train.distill import make_simkd_eval_step

        eval_step = make_simkd_eval_step(
            student, distiller, vars_t["params"], vars_t.get("batch_stats", {}),
            n_cls, eval_norm,
        )
    else:
        eval_step = make_eval_step(student.apply, n_cls, normalize_fn=eval_norm)

    if cfg.run.preflight_eval:
        # reference --skip_validation (inverted store_false flag): check
        # the loaded teacher on the test split before distilling from it
        # (train_student_comparison.py:488-496)
        t_eval = make_eval_step(teacher.apply, n_cls, normalize_fn=eval_norm)
        pre = evaluate(vars_t["params"], vars_t.get("batch_stats", {}),
                       test_loader, t_eval, mesh, n_cls)
        print(f"[pre-flight] teacher test acc {pre['acc']:.2f} "
              f"f1 {pre['f1']:.4f}")

    # wrap the loader so CRD contrast indices are drawn per batch
    class _SampledLoader:
        def __init__(self, inner):
            self.inner = inner
            self.batch_size = inner.batch_size

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for batch in self.inner:
                if sampler is not None:
                    batch["contrast_idx"] = sampler.sample(batch["index"]).astype(
                        np.int32
                    )
                yield batch

    loader = _SampledLoader(train_loader)

    from moma_tpu.core.preempt import GracefulStop

    best_acc, best_f1 = resumed_best_acc, resumed_best_f1
    t_start = time.time()
    stop_guard = GracefulStop()
    stop_guard.__enter__()
    try:
        return _epoch_loop_student(
            cfg, state, stats, ckpt, stop_guard, step_fn, eval_step, loader,
            val_loader, test_loader, train_rng, mesh, n_cls, start_epoch,
            best_acc, best_f1, t_start, run_dir, simkd_eval,
            resume_step=resume_step,
        )
    finally:
        # restore prior handlers so later signals in this process are not
        # swallowed by a dead flag
        stop_guard.__exit__()


def _epoch_loop_student(cfg, state, stats, ckpt, stop_guard, step_fn,
                        eval_step, loader, val_loader, test_loader, train_rng,
                        mesh, n_cls, start_epoch, best_acc, best_f1, t_start,
                        run_dir, simkd_eval, resume_step=0):
    import contextlib

    from moma_tpu.train.loop import NonFiniteLossError

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
                    state, loader, step_fn, mesh, epoch, train_rng,
                    print_freq=cfg.run.print_freq, log_fn=stats.scalar,
                    stop=stop_guard, start_step=ep_start,
                )
        except NonFiniteLossError as e:
            print(f"[nan-guard] {e}; stopping — resume from the last "
                  f"epoch-end checkpoint (epoch {epoch - 1})")
            stats.update_epoch(epoch, {"nan_aborted": True})
            ckpt.wait()  # flush in-flight async save + meta
            return state, {"best_acc": best_acc, "best_f1": best_f1,
                           "run_dir": run_dir, "nan_aborted": True}
        if stop_guard.stopping:
            save_state = {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step,
            }
            if state.extra is not None:
                save_state["extra"] = state.extra
            # see train/teacher.py: resume_step == len(loader) resumes into
            # 0 remaining batches + the epoch's eval, never a double apply
            meta = {"epoch": epoch - 1, "preempted": True,
                    "resume_step": tr["steps"]}
            ckpt.save("latest", save_state, meta)
            print(f"[preempt] checkpointed at epoch {epoch} step "
                  f"{tr['steps']}/{len(loader)}; exiting")
            return state, {"best_acc": best_acc, "best_f1": best_f1,
                           "run_dir": run_dir, "preempted": True}
        eval_params = state.params if simkd_eval else state.params["student"]
        eval_bs = state.batch_stats if simkd_eval else state.batch_stats["student"]
        val = evaluate(eval_params, eval_bs, val_loader, eval_step, mesh, n_cls)
        row = {
            "train_loss": tr["loss"], "train_acc": tr["acc1"], "ips": tr["ips"],
            "val_loss": val["loss"], "val_acc": val["acc"], "val_f1": val["f1"],
        }
        if ep_start:
            # resumed epoch: train stats cover only the tail batches
            row["train_partial_from"] = ep_start
        if not cfg.run.skip_test:
            test = evaluate(eval_params, eval_bs, test_loader, eval_step, mesh, n_cls)
            row.update(test_acc=test["acc"], test_f1=test["f1"])
        stats.update_epoch(epoch, row)
        print(
            f"epoch {epoch}: loss {tr['loss']:.4f} acc {tr['acc1']:.2f} | "
            f"val acc {val['acc']:.2f} f1 {val['f1']:.4f} | {tr['ips']:.1f} img/s"
        )
        save_state = {
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step,
        }
        if state.extra is not None:
            save_state["extra"] = state.extra
        meta = {"epoch": epoch, **row}
        # async: the disk commit overlaps the next epoch's compute
        ckpt.save("latest", save_state, meta, block=False)
        if val["acc"] > best_acc:
            best_acc = val["acc"]
            ckpt.save("best_acc", save_state, meta, block=False)
        if val["f1"] > best_f1:
            best_f1 = val["f1"]
            ckpt.save("best_f1", save_state, meta, block=False)

    ckpt.wait()  # commit the final epoch's async saves + meta sidecars
    stats.write_params_json(
        run_dir,
        {
            "config": cfg.to_json(),
            "best_val_acc": best_acc,
            "best_val_f1": best_f1,
            "hours": (time.time() - t_start) / 3600.0,
        },
    )
    return state, {"best_acc": best_acc, "best_f1": best_f1, "run_dir": run_dir}
