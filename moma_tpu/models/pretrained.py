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

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

# The reference resolves these --std_pre/--tec_pre tags through a table of
# absolute paths hardcoded to its author's machines (model_def.py:15-49 for
# the effiB0 tags, :66-76 for ssl_ciga, :8 for ImageNet meaning library
# weights).  The portable equivalent: a user-supplied registry.
REFERENCE_PRESET_TAGS = frozenset({
    "tma_class", "PANDA", "gastric_wsi", "gastric_wsi_DDP",
    "gastric_cancer_tma_sv0", "kather19", "kather19_nonorm",
    "crc_tp_folder1_None", "crc_tp_folder1_Img", "ssl_ciga", "ImageNet",
})
_SCRATCH_TAGS = frozenset({"", "NULL", "None", "none", "scratch"})
_TORCH_SUFFIXES = (".pth", ".pt", ".bin", ".ckpt")


class PretrainResolutionError(KeyError):
    pass


def resolve_pretrain(spec: Optional[str]) -> Optional[str]:
    """Resolve a --pretrain/--std_pre/--tec_pre value to a checkpoint path.

    Accepts: None / 'NULL' (train from scratch), an existing path (used
    as-is), or a named preset tag.  Tags resolve through, in order:
      1. $MOMA_PRETRAIN_REGISTRY — a JSON file mapping tag -> path
         (relative paths are taken relative to the registry file);
      2. $MOMA_PRETRAIN_DIR (default ./pretrained): {dir}/{tag} as an
         orbax checkpoint dir, or {dir}/{tag}.pth/.pt/.bin/.ckpt.
    Unresolvable tags raise instead of being silently ignored — the
    reference's behavior for its known tags is to load a checkpoint from a
    hardcoded absolute path (model_def.py:15-49), so skipping would train a
    different model than asked for.
    """
    if spec is None:
        return None
    spec = str(spec)
    if spec in _SCRATCH_TAGS:
        return None
    if os.path.exists(spec):
        return spec

    tried = []
    reg_path = os.environ.get("MOMA_PRETRAIN_REGISTRY")
    if reg_path and os.path.exists(reg_path):
        with open(reg_path) as f:
            table = json.load(f)
        if spec in table:
            p = table[spec]
            if not os.path.isabs(p):
                p = os.path.join(os.path.dirname(os.path.abspath(reg_path)), p)
            if os.path.exists(p):
                return p
            tried.append(f"registry entry {p} (missing)")
        else:
            tried.append(f"registry {reg_path} (no '{spec}' key)")
    pre_dir = os.environ.get("MOMA_PRETRAIN_DIR", "./pretrained")
    for cand in [os.path.join(pre_dir, spec)] + [
        os.path.join(pre_dir, spec + sfx) for sfx in _TORCH_SUFFIXES
    ]:
        if os.path.exists(cand):
            return cand
        tried.append(cand)

    known = (
        "a tag the reference maps to a machine-specific absolute path "
        "(model_def.py:15-49)"
        if spec in REFERENCE_PRESET_TAGS
        else "not a reference preset tag"
    )
    raise PretrainResolutionError(
        f"cannot resolve pretrain '{spec}' ({known}): not an existing path, "
        f"and no checkpoint found at: {', '.join(tried)}. Provide the file "
        f"via $MOMA_PRETRAIN_REGISTRY (JSON tag->path) or place it under "
        f"$MOMA_PRETRAIN_DIR as {spec}/ (orbax) or {spec}.pth (torch)."
    )


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
    the checkpoint at `path` (a filesystem path or a preset tag — see
    resolve_pretrain)."""
    path = resolve_pretrain(str(path))
    if path is None:
        return variables
    if path.endswith(_TORCH_SUFFIXES):
        from moma_tpu.models.torch_import import convert_torch_checkpoint

        # cross-task transfer: drop the classifier at conversion time (the
        # label spaces differ, so its shapes cannot line up).
        loaded = convert_torch_checkpoint(path, variables, drop_classifier=not strict)
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
