"""Checkpoint save/restore via orbax.

Closes the reference's resume gap (SURVEY.md §5): the reference saves only
{epoch, model, best_acc, optimizer} on new bests (train_teacher.py:306-332)
and can never resume — MoCo queue, EMA teacher and RNG are lost.  Here the
FULL train state pytree (params, batch_stats, opt state, queue, EMA
teacher, step, rng) round-trips, plus best-metric snapshots.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: latest/ for resume, best_acc/ and best_f1/ for
    the reference's best-metric snapshots.

    Saves can be ASYNC (`block=False`): orbax's StandardCheckpointer
    copies arrays to host synchronously, then commits to disk on a
    background thread — the per-epoch 'latest' save overlaps its disk
    write with the next epoch's device compute instead of stalling the
    loop.  The `<tag>.meta.json` sidecar is only written once the commit
    finishes (wait()), preserving the invariant that a meta file marks a
    COMPLETE checkpoint (resume and preemption logic read it)."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_meta: list = []

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def _write_meta(self, tag: str, meta: dict) -> None:
        with open(os.path.join(self.directory, f"{tag}.meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)

    def wait(self) -> None:
        """Block until every in-flight save has committed, then write the
        meta sidecars of the saves that were issued with block=False."""
        self._ckptr.wait_until_finished()
        for tag, meta in self._pending_meta:
            self._write_meta(tag, meta)
        self._pending_meta.clear()

    def save(self, tag: str, state: Any, meta: Optional[dict] = None,
             block: bool = True):
        # orbax would wait for the previous commit itself before starting a
        # new one; waiting here first lets us also flush its meta sidecar
        self.wait()
        self._ckptr.save(self._path(tag), state, force=True)
        if block:
            self._ckptr.wait_until_finished()
            if meta is not None:
                self._write_meta(tag, meta)
        elif meta is not None:
            self._pending_meta.append((tag, meta))

    def restore(self, tag: str, target: Any) -> Any:
        """Restore into the structure of `target` (an abstract or concrete
        pytree of the same shape)."""
        self.wait()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckptr.restore(self._path(tag), abstract)

    def exists(self, tag: str) -> bool:
        self.wait()
        return os.path.isdir(self._path(tag))

    def meta(self, tag: str) -> Optional[dict]:
        self.wait()
        p = os.path.join(self.directory, f"{tag}.meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None


class StatsWriter:
    """Per-epoch JSON stat history — the `update_dict_to_json` equivalent
    (helper/util.py:87-109) plus a JSONL scalar stream for step metrics and
    TensorBoard event files (the reference's rank-0 `tensorboard_logger`
    scalars, train_teacher.py:228,265-303) via the dependency-free
    core/tb_writer.py."""

    def __init__(self, directory: str, tensorboard: bool = True):
        os.makedirs(directory, exist_ok=True)
        self.stat_path = os.path.join(directory, "stat.json")
        self.scalar_path = os.path.join(directory, "scalars.jsonl")
        self._stats = {}
        if os.path.exists(self.stat_path):
            with open(self.stat_path) as f:
                self._stats = json.load(f)
        self._tb = None
        if tensorboard:
            from moma_tpu.core.tb_writer import TBWriter

            self._tb = TBWriter(os.path.join(directory, "tb"))

    def update_epoch(self, epoch: int, values: dict):
        self._stats[str(epoch)] = {
            k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
            for k, v in values.items()
        }
        tmp = self.stat_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._stats, f, indent=2)
        os.replace(tmp, self.stat_path)
        if self._tb is not None:
            for k, v in values.items():
                if isinstance(v, (int, float, np.floating)) and not isinstance(v, bool):
                    self._tb.scalar(f"epoch/{k}", float(v), epoch)
            self._tb.flush()

    def scalar(self, step: int, **values):
        with open(self.scalar_path, "a") as f:
            f.write(json.dumps({"step": step, **{k: float(v) for k, v in values.items()}}) + "\n")
        if self._tb is not None:
            self._tb.scalars(step, **values)

    def write_params_json(self, directory: str, payload: dict):
        """parameters.json flag dump (train_teacher.py:358-366 parity)."""
        with open(os.path.join(directory, "parameters.json"), "w") as f:
            json.dump(payload, f, indent=2, default=str)
