"""Tensor-parallel ViT forward — Megatron-style 1-D TP over the mesh's
'model' axis for FIXED (gradient-free) ViT teachers.

The reference has no model parallelism at all — its only distribution is
data-parallel DDP (SURVEY §2.3; `learning/base_trainer.py` spawns one
process per GPU and `train_student_moma.py:398-416` wraps the student in
DDP while the teacher is a plain replicated `.cuda()` module).  This
module is a TPU-native scaling capability layered on top of capability
parity: a big ViT teacher (vit_base@384, in21k weights — the reference's
`model_def.py:78-108` family) shards its attention heads and MLP hidden
dimension over the mesh's 'model' axis so that

  (a) each chip stores 1/M of every transformer block's weights, and
  (b) each block costs exactly two all-reduces (attention out-projection
      + MLP down-projection), inserted by XLA/GSPMD from the weight
      sharding annotations alone — the scaling-book recipe: pick a mesh,
      annotate shardings, let the compiler place collectives over ICI.

Why a layout conversion is needed (`tp_convert`): the fused qkv Dense
kernel is (C, 3C) with 3-major output ordering [3, H, hd] (the forward
reshapes to (B, N, 3, H, hd), models/vit.py:36) — a contiguous 3C/M
column chunk mixes q/k/v projections, so the stock layout cannot be
head-sharded.  It is split ONCE at setup into per-projection kernels
q/k/v: (C, H, hd) and proj: (H, hd, C), which shard cleanly as
P(·, 'model', ·).  LayerNorms, patch-embed, cls/pos embeddings and the
classifier stay replicated and run through the SAME Flax submodules as
`models/vit.VisionTransformer` (bit-identical numerics there); only the
attention and MLP contractions are hand-written einsums, whose TP
execution differs from the dense matmul only by fp reduction order.

Used by `train/moma.run_moma` in cross-arch (EmaTec) mode with
``--model_parallel M``: the fixed ViT KL-teacher runs tensor-parallel
while the batch stays sharded over 'data' (2-D DP x TP).  The teacher is
frozen in that mode (the EMA momentum encoder is a student copy), so the
conversion happens exactly once.  Parity + sharding evidence:
tests/test_vit_tp.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moma_tpu.core.mesh import MODEL_AXIS
from moma_tpu.models.common import TorchLinear
from moma_tpu.models.vit import VisionTransformer


def is_tp_model(model) -> bool:
    """Only the ViT family has the clean head/hidden TP decomposition."""
    return isinstance(model, VisionTransformer)


def check_tp_teacher(model, mesh: Mesh, teacher_quant: str = "none") -> None:
    """Raise with a clear message when TP cannot apply to this teacher."""
    mp = mesh.shape[MODEL_AXIS]
    if not is_tp_model(model):
        raise ValueError(
            f"tensor-parallel teacher requires a ViT family model, got "
            f"{type(model).__name__}"
        )
    if model.num_heads % mp != 0:
        raise ValueError(
            f"teacher num_heads={model.num_heads} not divisible by "
            f"model_parallel={mp}"
        )
    if int(model.dim * 4.0) % mp != 0:
        raise ValueError(
            f"teacher MLP hidden dim {int(model.dim * 4.0)} not divisible "
            f"by model_parallel={mp}"
        )
    if teacher_quant != "none":
        raise ValueError(
            "--teacher_quant does not compose with the tensor-parallel ViT "
            "teacher (quantization intercepts Flax module calls; the TP "
            "attention/MLP contractions are functional einsums)"
        )


def tp_convert(params, num_heads: int):
    """Standard VisionTransformer param tree -> TP-layout tree.

    Per Block_i: MHSA_0's fused qkv Dense (C, 3C) splits into
    q/k/v kernels (C, H, hd) + biases (H, hd); the out-projection
    Dense (C, C) reshapes to (H, hd, C).  Everything else passes through
    untouched (and keeps its Flax submodule layout so the TP forward can
    .apply the original modules on it).  Pure jnp — jit-able, so the
    conversion runs as ONE device program (tp_place).
    """
    out = {}
    for name, sub in params.items():
        if not name.startswith("Block_"):
            out[name] = sub
            continue
        mh = sub["MHSA_0"]
        C = mh["Dense_0"]["kernel"].shape[0]
        H = num_heads
        hd = C // H
        qkv_k = mh["Dense_0"]["kernel"].reshape(C, 3, H, hd)
        qkv_b = mh["Dense_0"]["bias"].reshape(3, H, hd)
        out[name] = {
            "LayerNorm_0": sub["LayerNorm_0"],
            "LayerNorm_1": sub["LayerNorm_1"],
            "attn": {
                "q_kernel": qkv_k[:, 0],
                "k_kernel": qkv_k[:, 1],
                "v_kernel": qkv_k[:, 2],
                "q_bias": qkv_b[0],
                "k_bias": qkv_b[1],
                "v_bias": qkv_b[2],
                "proj_kernel": mh["Dense_1"]["kernel"].reshape(H, hd, C),
                "proj_bias": mh["Dense_1"]["bias"],
            },
            "Dense_0": sub["Dense_0"],  # MLP up: (C, F) — shard F (cols)
            "Dense_1": sub["Dense_1"],  # MLP down: (F, C) — shard F (rows)
        }
    return out


def tp_shardings(tp_params, mesh: Mesh):
    """NamedSharding tree matching tp_convert's output: attention heads
    and the MLP hidden dimension over 'model', the rest replicated."""
    rep = NamedSharding(mesh, P())

    def block_spec(blk):
        sh = jax.tree_util.tree_map(lambda _: rep, blk)
        sh["attn"] = {
            "q_kernel": NamedSharding(mesh, P(None, MODEL_AXIS, None)),
            "k_kernel": NamedSharding(mesh, P(None, MODEL_AXIS, None)),
            "v_kernel": NamedSharding(mesh, P(None, MODEL_AXIS, None)),
            "q_bias": NamedSharding(mesh, P(MODEL_AXIS, None)),
            "k_bias": NamedSharding(mesh, P(MODEL_AXIS, None)),
            "v_bias": NamedSharding(mesh, P(MODEL_AXIS, None)),
            "proj_kernel": NamedSharding(mesh, P(MODEL_AXIS, None, None)),
            "proj_bias": rep,
        }
        sh["Dense_0"] = {
            "kernel": NamedSharding(mesh, P(None, MODEL_AXIS)),
            "bias": NamedSharding(mesh, P(MODEL_AXIS)),
        }
        sh["Dense_1"] = {
            "kernel": NamedSharding(mesh, P(MODEL_AXIS, None)),
            "bias": rep,
        }
        return sh

    return {
        name: (block_spec(sub) if name.startswith("Block_")
               else jax.tree_util.tree_map(lambda _: rep, sub))
        for name, sub in tp_params.items()
    }


def tp_place(params, model: VisionTransformer, mesh: Mesh):
    """Convert + shard in one jitted program (eager per-op dispatch costs
    one relay RTT each on axon — ~100 ops for a 12-block ViT)."""
    H = model.num_heads
    shapes = jax.eval_shape(lambda p: tp_convert(p, H), params)
    sh = tp_shardings(shapes, mesh)
    return jax.jit(lambda p: tp_convert(p, H), out_shardings=sh)(params)


def _promote(dtype, *arrays):
    """flax.linen.Dense dtype semantics: dtype=None promotes operands to
    their common result type; a set dtype casts everything to it."""
    dt = dtype if dtype is not None else jnp.result_type(*arrays)
    return [a.astype(dt) for a in arrays]


def make_tp_vit_apply(model: VisionTransformer, mesh: Mesh,
                      sequence_parallel: bool = False):
    """Build an apply(variables, x, train=False) -> ((grid, cls), logits)
    over the TP-layout tree, signature-compatible with
    VisionTransformer.apply (the teacher_apply_fn contract).

    ``train`` is accepted and ignored — ViTs here have no BN/dropout, and
    the TP teacher is only used as a frozen scorer.

    ``sequence_parallel`` adds Megatron-style SP on top of TP: the
    residual stream between blocks is constrained to be sharded over the
    TOKEN axis (`P(None, 'model', None)`), so LayerNorms and residual
    adds run on 1/M of the tokens and each chip stores 1/M of the
    residual activations.  GSPMD then rewrites each block's two
    all-reduces (head/hidden contraction -> token-sharded consumer) into
    reduce-scatters, and inserts the matching token all-gathers in front
    of the qkv / MLP-up projections — same total collective bytes as
    plain TP (RS + AG == AR), but sharded elementwise compute and a 1/M
    residual-activation footprint.  The HLO structure (reduce-scatters
    present, one all-reduce at most for the replicated epilogue) is
    pinned by tests/test_vit_tp.py.
    """
    H = model.num_heads
    ps = model.patch_size
    dim = model.dim
    depth = model.depth
    dtype = model.dtype
    hd = dim // H
    scale = hd ** -0.5
    mlp_hidden = int(dim * 4.0)  # Block.mlp_ratio default

    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    patch = nn.Conv(dim, (ps, ps), strides=(ps, ps), dtype=dtype)
    mlp_up = nn.Dense(mlp_hidden, dtype=dtype)
    mlp_down = nn.Dense(dim, dtype=dtype)
    classifier = TorchLinear(model.num_classes)

    if sequence_parallel:
        # Three anchors make GSPMD produce exactly the Megatron TP+SP
        # schedule instead of its own fallback (which, left to sharding
        # propagation alone, re-gathers the small weights and runs the
        # whole block token-sharded):
        #   seq_shard  — the residual stream is token-sharded between
        #                blocks (LN/adds on 1/M tokens, 1/M activations)
        #   head_shard — attention q/k/v/scores/out stay HEAD-sharded
        #                (full tokens inside attention)
        #   hid_shard  — the MLP hidden activation stays hidden-sharded
        # The head/hidden contraction feeding a token-sharded consumer
        # then lowers to a reduce-scatter, and the qkv / MLP-up inputs
        # get the matching token all-gather.
        seq_sharding = NamedSharding(mesh, P(None, MODEL_AXIS, None))
        head_sharding = NamedSharding(mesh, P(None, MODEL_AXIS, None, None))
        hid_sharding = NamedSharding(mesh, P(None, None, MODEL_AXIS))

        def seq_shard(t):
            return jax.lax.with_sharding_constraint(t, seq_sharding)

        def head_shard(t):
            return jax.lax.with_sharding_constraint(t, head_sharding)

        def hid_shard(t):
            return jax.lax.with_sharding_constraint(t, hid_sharding)
    else:
        def seq_shard(t):
            return t

        def head_shard(t):
            return t

        def hid_shard(t):
            return t

    def apply(variables, x, train: bool = False, **_ignored):
        p = variables["params"]
        B, Hi, Wi, _ = x.shape
        gh, gw = Hi // ps, Wi // ps
        x = patch.apply({"params": p["patch_embed"]}, x)
        x = x.reshape(B, gh * gw, dim)
        cls = p["cls_token"]
        x = jnp.concatenate(
            [jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1
        )
        x = seq_shard(x + p["pos_embed"].astype(x.dtype))
        for i in range(depth):
            bp = p[f"Block_{i}"]
            a = bp["attn"]
            y = ln.apply({"params": bp["LayerNorm_0"]}, x)
            # head-parallel attention: kernels are (C, H/M, hd) per shard;
            # q/k/v and the softmax run sharded over 'model', the out-
            # projection contracts the sharded head axis -> GSPMD inserts
            # the block's first all-reduce here
            yq, qk, kk, vk = _promote(
                dtype, y, a["q_kernel"], a["k_kernel"], a["v_kernel"]
            )
            q = jnp.einsum("bnc,chd->bhnd", yq, qk) + a["q_bias"].astype(
                yq.dtype)[None, :, None, :]
            k = jnp.einsum("bnc,chd->bhnd", yq, kk) + a["k_bias"].astype(
                yq.dtype)[None, :, None, :]
            v = jnp.einsum("bnc,chd->bhnd", yq, vk) + a["v_bias"].astype(
                yq.dtype)[None, :, None, :]
            q, k, v = head_shard(q), head_shard(k), head_shard(v)
            att = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
            att = jax.nn.softmax(
                att.astype(jnp.float32), axis=-1
            ).astype(q.dtype)
            o = head_shard(jnp.einsum("bhnm,bhmd->bhnd", att, v))
            o, pk = _promote(dtype, o, a["proj_kernel"])
            z = jnp.einsum("bhnd,hdc->bnc", o, pk) + a["proj_bias"].astype(
                o.dtype)
            # under SP the head-contraction's partial sums reduce-scatter
            # straight into the token-sharded residual
            x = seq_shard(x + z)
            # MLP: up-projection output (and gelu) sharded over 'model'
            # via the column-sharded kernel; the row-sharded down-
            # projection contracts it -> the block's second all-reduce
            y = ln.apply({"params": bp["LayerNorm_1"]}, x)
            h = hid_shard(mlp_up.apply({"params": bp["Dense_0"]}, y))
            h = nn.gelu(h, approximate=False)
            x = seq_shard(x + mlp_down.apply({"params": bp["Dense_1"]}, h))
        x = ln.apply({"params": p["norm"]}, x)
        cls_out = x[:, 0].astype(jnp.float32)
        grid = x[:, 1:].reshape(B, gh, gw, dim)
        logits = classifier.apply({"params": p["classifier"]}, cls_out)
        return (grid, cls_out), logits

    return apply
