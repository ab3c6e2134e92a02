"""Graceful preemption: stop mid-epoch, checkpoint, resume.

Closes a gap the reference leaves open (SURVEY.md §5: no failure
detection; a crash loses the run).
"""

import os
import signal
import threading
import time

import numpy as np
import pytest

from moma_tpu.core.config import Config
from moma_tpu.core.preempt import NEVER, GracefulStop


def test_stop_flag_request():
    g = GracefulStop()
    assert not g.stopping
    g.request()
    assert g.stopping
    assert not NEVER.stopping


def test_signal_handler_sets_flag():
    with GracefulStop() as g:
        os.kill(os.getpid(), signal.SIGTERM)
        # signal delivery is synchronous in the main thread on return
        for _ in range(100):
            if g.stopping:
                break
            time.sleep(0.01)
        assert g.stopping


def test_train_one_epoch_honors_stop(tmp_path):
    """A stop request mid-epoch breaks the batch loop; the returned state
    is a consistent pytree that the runner can checkpoint."""
    import jax
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
    ds = synthetic_dataset(64, 32, 10, seed=0)
    loader = Loader(ds, 8, train=True, seed=0)
    step_fn = make_vanilla_train_step(augment_fn=cifar_train_augment)

    class StopAfter:
        def __init__(self, n):
            self.n = n
            self.calls = 0

        @property
        def stopping(self):
            self.calls += 1
            return self.calls > self.n

    stop = StopAfter(3)
    state2, metrics = train_one_epoch(
        state, loader, step_fn, mesh, 1, jax.random.PRNGKey(1),
        print_freq=1, stop=stop,
    )
    assert int(state2.step) == 3  # exactly 3 steps ran before the stop
    assert np.isfinite(metrics["loss"])


def test_runner_preempt_checkpoint_and_resume(tmp_path):
    """End-to-end: SIGTERM-equivalent stop during epoch 1 writes latest/
    with preempted meta; rerunning with resume redoes the epoch."""
    from moma_tpu.core import preempt as P
    from moma_tpu.train.teacher import run_teacher

    cfg = Config()
    cfg.run.save_dir = str(tmp_path)
    cfg.run.epochs = 2
    cfg.run.print_freq = 1
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.model_s.name = "resnet8"
    cfg.model_s.n_cls = 10

    # trip the stop flag shortly after training starts, from a thread
    orig_enter = P.GracefulStop.__enter__
    guards = []

    def patched_enter(self):
        guards.append(self)
        threading.Timer(0.5, self.request).start()
        return orig_enter(self)

    P.GracefulStop.__enter__ = patched_enter
    try:
        state, result = run_teacher(cfg, synthetic=True)
    finally:
        P.GracefulStop.__enter__ = orig_enter
    assert result.get("preempted") is True
    run_dir = result["run_dir"]
    meta_path = os.path.join(run_dir, "ckpt", "latest.meta.json")
    assert os.path.exists(meta_path)

    # resume: must complete the remaining epochs cleanly
    cfg.run.resume = True
    state, result = run_teacher(cfg, synthetic=True)
    assert result.get("preempted") is None
    assert result["best_acc"] >= 0


def test_nan_guard_raises():
    """Failure detection: a NaN loss at a sync point aborts the epoch with
    NonFiniteLossError instead of silently training on poisoned state."""
    import jax
    import jax.numpy as jnp

    from moma_tpu.core.mesh import create_mesh, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_train_augment
    from moma_tpu.data.pipeline import Loader, synthetic_dataset
    from moma_tpu.models import create_model
    from moma_tpu.train.loop import NonFiniteLossError, train_one_epoch
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
    inner = make_vanilla_train_step(augment_fn=cifar_train_augment)

    def poisoned(state, batch, rng):
        state, metrics = inner(state, batch, rng)
        metrics = dict(metrics)
        metrics["loss"] = metrics["loss"] * jnp.nan
        return state, metrics

    import pytest as _pytest

    with _pytest.raises(NonFiniteLossError):
        train_one_epoch(state, loader, poisoned, mesh, 1,
                        jax.random.PRNGKey(1), print_freq=1)
