"""Pretrained-weight bootstrapping — the model_def.py / load_pretrained_weights
capability (reference model_def.py:7-111, helper/util.py:141-162).

Two sources:
  * orbax checkpoints produced by this framework (teacher training etc.)
  * torch .pth state dicts (reference-trained weights) — converted via the
    structural mapper in moma_tpu/models/torch_import.py

`strict=False` drops the classifier before loading — the reference's
cross-task transfer mechanism (--std_strict/--tec_strict; classifier
popping at helper/util.py:156-159) for mismatched label spaces.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _strip_classifier(params: Dict) -> Dict:
    """Remove the canonical 'classifier' subtree (cross-task transfer)."""
    return {k: v for k, v in params.items() if k != "classifier"}


def _merge(dst, src, path=""):
    """Recursively overwrite dst leaves with src leaves where shapes match;
    raise on mismatch (the strict=True behavior)."""
    out = dict(dst)
    for k, v in src.items():
        if k not in out:
            raise KeyError(f"unexpected key {path}/{k} in checkpoint")
        if isinstance(v, dict):
            out[k] = _merge(out[k], v, f"{path}/{k}")
        else:
            if tuple(np.shape(out[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: "
                    f"{np.shape(out[k])} vs {np.shape(v)}"
                )
            out[k] = v
    return out


def load_pretrained_params(variables: Dict, path: str, strict: bool = True) -> Dict:
    """Returns a new `variables` dict with params/batch_stats replaced from
    the checkpoint at `path`."""
    path = str(path)
    if path.endswith((".pth", ".pt", ".bin")):
        from moma_tpu.models.torch_import import convert_torch_checkpoint

        loaded = convert_torch_checkpoint(path, variables)
    else:
        loaded = _load_orbax(path, variables)

    params = loaded.get("params", {})
    batch_stats = loaded.get("batch_stats", {})
    if not strict:
        params = _strip_classifier(params)
    new_vars = dict(variables)
    new_vars["params"] = _merge(variables["params"], params)
    if batch_stats:
        new_vars["batch_stats"] = _merge(variables["batch_stats"], batch_stats)
    return new_vars


def _load_orbax(path: str, variables: Dict) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # our CheckpointManager layouts: teacher saves {'params','batch_stats',...};
    # student/moma save params={'student':…, ...}
    meta = ckptr.metadata(path)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    restored = ckptr.restore(path)
    params = restored.get("params", restored)
    batch_stats = restored.get("batch_stats", {})
    if isinstance(params, dict) and "student" in params:
        params = params["student"]
        if isinstance(batch_stats, dict) and "student" in batch_stats:
            batch_stats = batch_stats["student"]
    return {"params": params, "batch_stats": batch_stats}
