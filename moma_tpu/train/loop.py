"""Epoch-level drivers: train epochs, evaluation, best-checkpoint logic.

Functional replacement for helper/loops_moma.py's train_vanilla /
validate_vanilla and the per-epoch bookkeeping in train_teacher.py:244-350.
Device work is one jitted call per batch; the host only moves uint8 data
and accumulates meters.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from moma_tpu.core.mesh import data_sharding
from moma_tpu.core.metrics import EvalAccumulator, Meter


class NonFiniteLossError(RuntimeError):
    """Raised by train_one_epoch when a sync point sees NaN/Inf loss."""


def shard_batch(batch: dict, mesh) -> dict:
    """device_put each array with its batch-sharded NamedSharding."""
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, data_sharding(mesh, ndim=np.ndim(v)))
    return out


def train_one_epoch(
    state,
    loader,
    step_fn: Callable,
    mesh,
    epoch: int,
    base_rng: jax.Array,
    print_freq: int = 100,
    log_fn: Optional[Callable] = None,
    stop=None,
    start_step: int = 0,
) -> tuple:
    """Runs one epoch; returns (state, {'loss','acc1','acc5','time',...}).

    `stop` (core.preempt.GracefulStop) aborts between steps when set —
    the returned state is consistent and checkpointable mid-epoch; the
    metrics' 'steps' entry records how many of the epoch's batches have
    run in total, so the runner can persist an exact resume point.

    `start_step` resumes MID-epoch: the loader (deterministic, seeded
    shuffle) skips the first `start_step` batches by pure index math and
    the per-step RNG folding continues at the same indices — a preempted
    epoch finished under `start_step=k` is bit-identical to the
    uninterrupted run (tests/test_midepoch_resume.py)."""
    loader.set_epoch(epoch)
    if hasattr(loader, "set_start_batch"):
        loader.set_start_batch(start_step)
    elif start_step:
        raise ValueError(
            f"start_step={start_step}: this loader cannot resume mid-epoch"
        )
    meters = {k: Meter() for k in ("loss", "acc1", "acc5", "batch_time", "data_time")}
    t0 = time.perf_counter()
    bs = loader.batch_size
    # FULL-coverage epoch statistics with zero extra syncs: accumulate the
    # step scalars as LAZY device values (3 tiny adds/step ride the async
    # dispatch stream) and fetch once at epoch end — the reference's
    # every-batch AverageMeter (helper/loops_moma.py:44-46) without its
    # per-step host round-trip
    dev_sums = None
    n_steps = 0
    for i, batch in enumerate(loader, start=start_step):
        if stop is not None and stop.stopping:
            break
        t1 = time.perf_counter()
        meters["data_time"].update(t1 - t0)
        b = shard_batch(batch, mesh)
        rng = jax.random.fold_in(base_rng, epoch * 1_000_003 + i)
        state, metrics = step_fn(state, b, rng)
        contrib = (metrics["loss"], metrics["acc1"], metrics["acc5"])
        dev_sums = (
            contrib
            if dev_sums is None
            else tuple(a + c for a, c in zip(dev_sums, contrib))
        )
        n_steps += 1
        # async dispatch: only block on scalars at print points
        if (i + 1) % print_freq == 0 or (i + 1) == len(loader):
            for k in ("loss", "acc1", "acc5"):
                meters[k].update(float(metrics[k]), bs)
            if not np.isfinite(meters["loss"].val):
                # failure detection (absent in the reference, SURVEY §5):
                # a non-finite loss poisons every later step — stop here
                # so the runner can checkpoint the last finite state
                raise NonFiniteLossError(
                    f"non-finite loss {meters['loss'].val} at epoch {epoch} "
                    f"step {i + 1}"
                )
            if log_fn is not None:
                log_fn(
                    step=int(jax.device_get(state.step)),
                    loss=meters["loss"].val,
                    acc1=meters["acc1"].val,
                )
        t0 = time.perf_counter()
        meters["batch_time"].update(t0 - t1)
    if dev_sums is not None:  # ONE fetch for the whole epoch
        loss_avg, acc1_avg, acc5_avg = (float(s) / n_steps for s in dev_sums)
    else:
        loss_avg = acc1_avg = acc5_avg = 0.0
    return state, {
        "loss": loss_avg,
        "acc1": acc1_avg,
        "acc5": acc5_avg,
        "batch_time": meters["batch_time"].avg,
        "data_time": meters["data_time"].avg,
        "ips": bs / max(meters["batch_time"].avg, 1e-9),
        "steps": start_step + n_steps,
    }


def evaluate(
    params,
    batch_stats,
    loader,
    eval_step: Callable,
    mesh,
    n_cls: int,
) -> Dict[str, float]:
    """Full-split evaluation: loss, top-1, macro-F1 from one global
    conf-mat (validate_vanilla + process_accumulated_output parity).

    Accumulates (loss_sum, n, conf_mat) ON DEVICE and fetches once at the
    end — per-batch scalar fetches cost a host round-trip each (~50 ms on
    a relay-attached TPU), which dominated eval wall-clock."""
    acc = EvalAccumulator(n_cls=n_cls)
    tot_loss = tot_n = tot_cm = None
    for batch in loader:
        b = shard_batch(
            {k: batch[k] for k in ("image", "label", "mask")}, mesh
        )
        loss_sum, n, cm = eval_step(params, batch_stats, b)
        if tot_loss is None:
            tot_loss, tot_n, tot_cm = loss_sum, n, cm
        else:
            tot_loss, tot_n, tot_cm = tot_loss + loss_sum, tot_n + n, tot_cm + cm
    if tot_loss is not None:
        acc.update(float(tot_loss), float(tot_n), np.asarray(tot_cm))
    return {
        "loss": acc.loss,
        "acc": acc.acc,
        "f1": acc.f1,
        "conf_mat": acc.conf_mat.tolist(),
        "n": acc.n,
    }
