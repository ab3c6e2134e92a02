"""Exact mid-epoch resume: a preempted partial epoch continues at the
exact batch it stopped at, bit-identical to the uninterrupted run.

The reference can only save at epoch boundaries (train_teacher.py saves
per epoch; a crash loses the partial epoch).  Round-1 moma_tpu improved
that to "checkpoint mid-epoch, --resume redoes the epoch"; this closes
the remaining gap: the loader's shuffle is deterministic per (seed,
epoch) and the per-step RNG folds on the epoch-global batch index, so
resuming at batch k replays NOTHING and diverges NOWHERE.
"""

import json
import os
import threading

import jax
import numpy as np
import pytest

from moma_tpu.core.config import Config


def _teacher_cfg(tmp_path, epochs=2):
    cfg = Config()
    cfg.run.save_dir = str(tmp_path)
    cfg.run.epochs = epochs
    cfg.run.print_freq = 1
    cfg.run.skip_test = True
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.model_s.name = "resnet8"
    cfg.model_s.n_cls = 10
    return cfg


def test_loader_start_batch_skips_exactly():
    from moma_tpu.data.pipeline import Loader, synthetic_dataset

    ds = synthetic_dataset(64, 32, 10, seed=0)
    loader = Loader(ds, 8, train=True, seed=3)
    loader.set_epoch(5)
    full = [b["index"] for b in loader]
    loader.set_start_batch(3)
    tail = [b["index"] for b in loader]
    assert len(tail) == len(full) - 3
    for a, b in zip(full[3:], tail):
        np.testing.assert_array_equal(a, b)
    # start point is persistent until changed, and 0 restores the full epoch
    loader.set_start_batch(0)
    again = [b["index"] for b in loader]
    assert len(again) == len(full)


def test_split_epoch_bit_identical_to_straight():
    """train_one_epoch(k steps) + train_one_epoch(start_step=k) must
    produce the same final params as the uninterrupted epoch — same
    batches, same RNG folding, nothing replayed."""
    import jax.numpy as jnp

    from moma_tpu.core.mesh import create_mesh, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_train_augment
    from moma_tpu.data.pipeline import Loader, synthetic_dataset
    from moma_tpu.models import create_model
    from moma_tpu.train.loop import train_one_epoch
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    mesh = create_mesh()
    model = create_model("resnet8", num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
    )

    def fresh_state():
        tx = make_sgd(lr_schedule(0.05, 1, 8), 0.9, 5e-4)
        s = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx,
        )
        return jax.device_put(s, replicated_sharding(mesh))

    ds = synthetic_dataset(64, 32, 10, seed=0)
    loader = Loader(ds, 8, train=True, seed=0)
    # donate=False: fresh_state() reuses the init arrays across the three
    # runs — a donating step would delete them after the first epoch
    step_fn = make_vanilla_train_step(augment_fn=cifar_train_augment,
                                      donate=False)
    rng = jax.random.PRNGKey(1)

    straight, m = train_one_epoch(fresh_state(), loader, step_fn, mesh, 1,
                                  rng, print_freq=100)
    assert m["steps"] == len(loader)

    class StopAfter:
        def __init__(self, n):
            self.left = n

        @property
        def stopping(self):
            self.left -= 1
            return self.left < 0

    half, m1 = train_one_epoch(fresh_state(), loader, step_fn, mesh, 1, rng,
                               print_freq=100, stop=StopAfter(3))
    assert m1["steps"] == 3
    done, m2 = train_one_epoch(half, loader, step_fn, mesh, 1, rng,
                               print_freq=100, start_step=m1["steps"])
    assert m2["steps"] == len(loader)

    flat_a = jax.tree_util.tree_leaves(straight.params)
    flat_b = jax.tree_util.tree_leaves(done.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(straight.batch_stats),
                    jax.tree_util.tree_leaves(done.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(straight.step) == int(done.step)


def test_resume_at_epoch_boundary_applies_nothing():
    """A stop that lands exactly on the epoch's last batch records
    resume_step == len(loader); resuming runs ZERO batches (the epoch's
    updates are never applied twice) and reports full step count."""
    import jax.numpy as jnp

    from moma_tpu.core.mesh import create_mesh, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_train_augment
    from moma_tpu.data.pipeline import Loader, synthetic_dataset
    from moma_tpu.models import create_model
    from moma_tpu.train.loop import train_one_epoch
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    mesh = create_mesh()
    model = create_model("resnet8", num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
    )
    tx = make_sgd(lr_schedule(0.05, 1, 8), 0.9, 5e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    ds = synthetic_dataset(32, 32, 10, seed=0)
    loader = Loader(ds, 8, train=True, seed=0)
    step_fn = make_vanilla_train_step(augment_fn=cifar_train_augment,
                                      donate=False)
    state2, m = train_one_epoch(state, loader, step_fn, mesh, 1,
                                jax.random.PRNGKey(1), print_freq=100,
                                start_step=len(loader))
    assert m["steps"] == len(loader)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.step) == int(state.step)


def test_sp_pp_flags_rejected_outside_moma(tmp_path):
    """--sequence_parallel / --teacher_parallel pipeline / --pp_microbatch
    must error on runners that would silently ignore them."""
    from moma_tpu.train.teacher import run_teacher

    cfg = _teacher_cfg(tmp_path, epochs=1)
    cfg.run.sequence_parallel = True
    with pytest.raises(ValueError, match="distill moma"):
        run_teacher(cfg, synthetic=True)

    cfg.run.sequence_parallel = False
    cfg.run.teacher_parallel = "pipeline"
    with pytest.raises(ValueError, match="distill moma"):
        run_teacher(cfg, synthetic=True)

    from moma_tpu.core.config import DistillConfig, ModelConfig
    from moma_tpu.train.student import run_student

    cfg2 = _teacher_cfg(tmp_path / "s", epochs=1)
    cfg2.model_t = ModelConfig(name="resnet32", n_cls=10)
    cfg2.distill = DistillConfig(distill="kd", cls=1.0, div=1.0, beta=0.0)
    cfg2.run.pp_microbatch = 2
    with pytest.raises(ValueError, match="distill moma"):
        run_student(cfg2, synthetic=True)


def test_runner_midepoch_resume_matches_straight(tmp_path):
    """End-to-end through run_teacher: preempt mid-epoch-1, resume, and
    the final 2-epoch result equals a never-preempted 2-epoch run —
    including that the resumed epoch was NOT redone (step counter)."""
    from moma_tpu.core import preempt as P
    from moma_tpu.train.teacher import run_teacher

    # straight run
    cfg_a = _teacher_cfg(tmp_path / "straight")
    state_a, res_a = run_teacher(cfg_a, synthetic=True)

    # preempted run: trip the stop flag from a thread shortly after start
    cfg_b = _teacher_cfg(tmp_path / "split")
    orig_enter = P.GracefulStop.__enter__

    def patched_enter(self):
        threading.Timer(0.5, self.request).start()
        return orig_enter(self)

    P.GracefulStop.__enter__ = patched_enter
    try:
        state_b, res_b = run_teacher(cfg_b, synthetic=True)
    finally:
        P.GracefulStop.__enter__ = orig_enter
    assert res_b.get("preempted") is True
    meta = json.load(open(
        os.path.join(res_b["run_dir"], "ckpt", "latest.meta.json")))
    steps_done = int(state_b.step)
    # resume_step counts the stopped epoch's completed batches (8/epoch);
    # a boundary stop records resume_step == 8, never a full-epoch redo
    assert meta["resume_step"] % 8 == steps_done % 8

    # resume and finish
    cfg_b.run.resume = True
    state_b2, res_b2 = run_teacher(cfg_b, synthetic=True)
    assert res_b2.get("preempted") is None

    # total optimizer steps equal (nothing redone, nothing skipped)
    assert int(state_b2.step) == int(state_a.step)
    # final weights bit-identical to the uninterrupted run
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the run completed its bookkeeping
    assert res_b2["best_acc"] >= 0
