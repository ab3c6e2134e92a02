"""Attention-map extraction from trained MoMA checkpoints.

The reference's visualization surface: attn='self_viz' swaps the CMO
attention modules for Attention_viz, which returns the (H, N, N) map
alongside the output (criterion_moco_att.py:171-197, 330-334), and
get_histo_dataloader_viz builds a small per-class subset to feed it
(histo_dataset.py:784-842).  Here the same capability is a pure
function over a saved full-state MoMA checkpoint: rebuild the student /
teacher / CMO modules from the run's parameters.json, run one batch of
eval-mode embeds, and dump every plain-attention module's map.

Entry: `dump_attention_maps` (wired as test_eval --dump_attn).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def _load_run_config(run_dir: str) -> Optional[dict]:
    pj = os.path.join(run_dir, "parameters.json")
    if not os.path.exists(pj):
        return None
    with open(pj) as f:
        payload = json.load(f)
    cfg = payload.get("config", payload)
    if isinstance(cfg, str):  # StatsWriter stores cfg.to_json() as a string
        cfg = json.loads(cfg)
    return cfg


def dump_attention_maps(ckpt_path: str, run_dir: str, images, labels,
                        out_path: str, n_queue: int = 256) -> Optional[dict]:
    """Write an .npz of CMO attention maps for one batch.

    images: NORMALIZED (B, H, W, 3) f32 batch; labels: (B,) int.
    Returns {module: map shape} on success, None when the checkpoint has
    no CMO attention to visualize (vanilla/comparison runs, attn='none',
    cross-arch EmaTec runs, or a missing parameters.json).
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import ATTN2_MODES, ATTN_SETS, CMOHeads

    cfg = _load_run_config(run_dir)
    if cfg is None:
        print(f"[dump_attn] skip {run_dir}: no parameters.json")
        return None
    moma = cfg.get("moma", {})
    attn = moma.get("attn", "self")
    if attn not in ATTN_SETS or not ATTN_SETS[attn] or attn in ATTN2_MODES:
        print(f"[dump_attn] skip {run_dir}: attn={attn!r} exposes no maps")
        return None

    restored = ocp.StandardCheckpointer().restore(ckpt_path)
    params = restored.get("params", {})
    if not isinstance(params, dict) or "cmo" not in params:
        print(f"[dump_attn] skip {run_dir}: not a MoMA full-state checkpoint")
        return None
    cmo_params = params["cmo"]
    bs_all = restored.get("batch_stats", {})

    n_cls = int(cfg["model_s"]["n_cls"])
    student = create_model(cfg["model_s"]["name"], num_classes=n_cls)
    feats_s, _ = student.apply(
        {"params": params["student"],
         "batch_stats": bs_all.get("student", {})},
        images, train=False)

    teacher = create_model(cfg["model_t"]["name"], num_classes=n_cls)
    feats_t, _ = teacher.apply(
        {"params": restored["teacher_params"],
         "batch_stats": restored.get("teacher_batch_stats", {})},
        images, train=False)

    # Derive feat_dim from the checkpoint itself (the qkv in-dim of any
    # saved attention module) rather than trusting parameters.json — a
    # hard-coded fallback would surface a feat_dim mismatch as a shape
    # error deep inside apply (ADVICE r3).
    feat_dim = None
    for mod, sub in cmo_params.items():
        if mod.startswith("atts") and "TorchLinear_0" in sub:
            feat_dim = int(sub["TorchLinear_0"]["kernel"].shape[0])
            break
    if feat_dim is None:
        if "feat_dim" not in moma:
            print(f"[dump_attn] skip {run_dir}: checkpoint has no "
                  "attention qkv kernels and parameters.json has no "
                  "moma.feat_dim — cannot rebuild the CMO heads")
            return None
        feat_dim = int(moma["feat_dim"])
    heads = CMOHeads(head=moma.get("head", "mlp"), attn=attn,
                     feat_dim=feat_dim,
                     s_dim=feats_s[-1].reshape(feats_s[-1].shape[0], -1).shape[-1],
                     t_dim=feats_t[-1].reshape(feats_t[-1].shape[0], -1).shape[-1])
    q_in, _ = heads.embed("embed_s", cmo_params, bs_all.get("cmo", {}),
                          feats_s[-1], train=False)
    k_in, _ = heads.embed("embed_t", cmo_params, bs_all.get("cmo", {}),
                          feats_t[-1], train=False)

    inputs = {"atts_q": q_in, "atts_k": k_in,
              # dual/qk/all modes: one shared module acting on the
              # student embeds is the natural viz input
              "atts": q_in, "atts_p": q_in, "atts_n": k_in}
    queue_mem = restored.get("queue", {}).get("memory", {})
    if "memory" in queue_mem:
        inputs["atts_queue"] = jnp.asarray(queue_mem["memory"])[:n_queue]

    maps = heads.attn_maps(cmo_params, inputs)
    payload: Dict[str, np.ndarray] = {
        "labels": np.asarray(labels),
    }
    shapes = {}
    for name, (_, amap) in maps.items():
        payload[f"{name}_map"] = np.asarray(amap, np.float32)
        shapes[name] = tuple(payload[f"{name}_map"].shape)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **payload)
    print(f"[dump_attn] {out_path}: "
          + ", ".join(f"{k} {v}" for k, v in shapes.items()))
    return shapes
