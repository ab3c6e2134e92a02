"""Pipeline-parallel ViT forward — GPipe over the mesh's 'model' axis for
FIXED (gradient-free) ViT teachers.

The reference has no model parallelism (SURVEY §2.3 — its only
distribution is DDP, `learning/base_trainer.py` one process per GPU);
like models/vit_tp.py this is a TPU-native scaling capability layered on
top of capability parity.  Where TP shards every block's weights *within*
the block (heads / MLP hidden), PP shards the *depth*: with S pipeline
stages each chip stores depth/S consecutive transformer blocks whole, and
activations flow stage-to-stage over ICI neighbours via `lax.ppermute`.
The classic trade: TP pays two collectives per block every step; PP pays
one point-to-point hop per stage boundary per microbatch plus a bubble of
(S-1)/(T+S-1) idle ticks — and unlike TP it needs no divisibility from
heads or hidden dims, only from depth, so it composes with any width.

TPU-first design notes:
  * the schedule is a `lax.scan` over T+S-1 ticks of an SPMD program —
    every stage executes the SAME compiled body each tick (stage identity
    comes from `lax.axis_index`), which is exactly how a systolic
    pipeline wants to compile: one program, no data-dependent control
    flow, ppermute rides the ICI ring;
  * each stage's depth/S blocks run as a `lax.scan` over their STACKED
    parameters (one compiled block body per stage, not depth/S clones);
  * the patch embedding and the norm/classifier epilogue run outside the
    pipeline as ordinary replicated-jit ops — they are <2% of the FLOPs
    and keeping them out makes the pipelined region a pure token->token
    function.

Numerics: the per-block math applies the SAME Flax submodules on the
SAME (standard, unconverted) block parameter layout as
`models/vit.Block`, and microbatching splits the BATCH while attention
mixes only tokens *within* a sample — so the pipelined forward is
bit-comparable to the dense forward up to XLA scheduling (pinned to
rtol 2e-5 in tests/test_vit_pp.py alongside TP).

Used by `train/moma.run_moma` in cross-arch (EmaTec) mode with
``--model_parallel S --teacher_parallel pipeline``: the frozen ViT
KL-teacher pipelines over 'model' while the batch stays sharded over
'data'.  The teacher is frozen in that mode, so no pipelined backward is
needed (GPipe's re-forward would live here if it ever were).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moma_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, shard_map_compat
from moma_tpu.models.common import TorchLinear
from moma_tpu.models.vit import VisionTransformer


def is_pp_model(model) -> bool:
    """Uniform-depth transformer stacks pipeline cleanly."""
    return isinstance(model, VisionTransformer)


def check_pp_teacher(model, mesh: Mesh, n_micro: int,
                     batch_size: int | None = None,
                     teacher_quant: str = "none") -> None:
    """Raise with a clear message when PP cannot apply to this teacher."""
    S = mesh.shape[MODEL_AXIS]
    if not is_pp_model(model):
        raise ValueError(
            f"pipeline-parallel teacher requires a ViT family model, got "
            f"{type(model).__name__}"
        )
    if S < 2:
        raise ValueError("pipeline parallelism requires model_parallel > 1")
    if model.depth % S != 0:
        raise ValueError(
            f"teacher depth={model.depth} not divisible by "
            f"model_parallel={S} pipeline stages"
        )
    if n_micro < 1:
        raise ValueError(f"pp_microbatch must be >= 1, got {n_micro}")
    if batch_size is not None:
        local = batch_size // mesh.shape[DATA_AXIS]
        if batch_size % mesh.shape[DATA_AXIS] or local % n_micro:
            raise ValueError(
                f"per-device batch {batch_size}/{mesh.shape[DATA_AXIS]} "
                f"not divisible by pp_microbatch={n_micro}"
            )
    if teacher_quant != "none":
        raise ValueError(
            "--teacher_quant does not compose with the pipeline-parallel "
            "ViT teacher (quantization intercepts Flax module calls; the "
            "pipeline body scans stacked raw parameters)"
        )


def pp_stack(params, depth: int):
    """Standard VisionTransformer tree -> PP tree: the depth Block_i
    subtrees stack into one 'blocks' subtree with leading dim `depth`
    (identical leaf structure — Block params are uniform); every other
    leaf passes through untouched.  Pure jnp — jit-able (pp_place)."""
    blocks = [params[f"Block_{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    out = {k: v for k, v in params.items() if not k.startswith("Block_")}
    out["blocks"] = stacked
    return out


def pp_shardings(pp_params, mesh: Mesh):
    """'blocks' leaves shard their stacked-depth leading dim over 'model'
    (device s holds blocks [s*L, (s+1)*L) — its pipeline stage); the
    embedding/epilogue stays replicated."""
    rep = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P(MODEL_AXIS))
    return {
        name: jax.tree_util.tree_map(
            lambda _: staged if name == "blocks" else rep, sub
        )
        for name, sub in pp_params.items()
    }


def pp_place(params, model: VisionTransformer, mesh: Mesh):
    """Stack + shard in one jitted program (eager per-op dispatch costs a
    relay RTT each on axon)."""
    shapes = jax.eval_shape(lambda p: pp_stack(p, model.depth), params)
    sh = pp_shardings(shapes, mesh)
    return jax.jit(lambda p: pp_stack(p, model.depth), out_shardings=sh)(
        params)


def make_pp_vit_apply(model: VisionTransformer, mesh: Mesh,
                      n_micro: int | None = None):
    """Build an apply(variables, x, train=False) -> ((grid, cls), logits)
    over the PP-layout tree, signature-compatible with
    VisionTransformer.apply (the teacher_apply_fn contract).

    ``n_micro`` is the GPipe microbatch count T (default: S, one
    microbatch in flight per stage at steady state — bubble fraction
    (S-1)/(2S-1)); raise T to amortize the bubble at the cost of smaller
    per-tick matmuls.  ``train`` is accepted and ignored (no BN/dropout;
    frozen scorer).
    """
    S = mesh.shape[MODEL_AXIS]
    T = n_micro if n_micro is not None else S
    H = model.num_heads
    ps = model.patch_size
    dim = model.dim
    depth = model.depth
    dtype = model.dtype
    scale = (dim // H) ** -0.5

    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    patch = nn.Conv(dim, (ps, ps), strides=(ps, ps), dtype=dtype)
    qkv_dense = nn.Dense(3 * dim, dtype=dtype)
    attn_proj = nn.Dense(dim, dtype=dtype)
    mlp_up = nn.Dense(int(dim * 4.0), dtype=dtype)
    mlp_down = nn.Dense(dim, dtype=dtype)
    classifier = TorchLinear(model.num_classes)

    def block_apply(bp, x):
        # models/vit.Block.__call__ verbatim, on the standard param layout
        B, N, C = x.shape
        hd = C // H
        y = ln.apply({"params": bp["LayerNorm_0"]}, x)
        qkv = qkv_dense.apply({"params": bp["MHSA_0"]["Dense_0"]}, y)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ jnp.swapaxes(k, -2, -1)) * scale
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = (att @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + attn_proj.apply({"params": bp["MHSA_0"]["Dense_1"]}, o)
        y = ln.apply({"params": bp["LayerNorm_1"]}, x)
        h = mlp_up.apply({"params": bp["Dense_0"]}, y)
        h = nn.gelu(h, approximate=False)
        return x + mlp_down.apply({"params": bp["Dense_1"]}, h)

    def stage_fn(blocks_local, x):
        # one compiled block body scanning this stage's depth/S blocks
        def body(x, bp):
            return block_apply(bp, x), None

        x, _ = jax.lax.scan(body, x, blocks_local)
        return x

    fwd_ring = [(i, i + 1) for i in range(S - 1)]

    def spmd_pipeline(blocks_local, toks):
        # per-device body: toks (B_local, N, C); blocks_local (depth/S, ...)
        Bl, N, C = toks.shape
        micro = toks.reshape(T, Bl // T, N, C)
        stage = jax.lax.axis_index(MODEL_AXIS)
        buf = jnp.zeros_like(micro[0])
        outs = jnp.zeros_like(micro)

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped past the drain ticks —
            # those results are never written); others consume the hop
            inp = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, T - 1), 0, keepdims=False)
            y = stage_fn(blocks_local, jnp.where(stage == 0, inp, buf))
            # the last stage commits microbatch t-(S-1) once it exists
            oidx = t - (S - 1)
            oclip = jnp.clip(oidx, 0, T - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, oclip, 0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where((stage == S - 1) & (oidx >= 0), y, cur),
                oclip, 0,
            )
            buf = jax.lax.ppermute(y, MODEL_AXIS, fwd_ring)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(T + S - 1))
        # replicate the finished tokens from the last stage to every
        # stage so downstream replicated-jit consumers see one value
        # (masked psum == broadcast: ppermute is a strict permutation and
        # cannot multicast; the zeros from stages 0..S-2 add exactly)
        outs = jax.lax.psum(
            jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)),
            MODEL_AXIS,
        )
        return outs.reshape(Bl, N, C)

    def pipelined_blocks(blocks, toks):
        block_specs = jax.tree_util.tree_map(lambda _: P(MODEL_AXIS), blocks)
        return shard_map_compat(
            spmd_pipeline, mesh,
            in_specs=(block_specs, P(DATA_AXIS, None, None)),
            out_specs=P(DATA_AXIS, None, None),
        )(blocks, toks)

    def apply(variables, x, train: bool = False, **_ignored):
        p = variables["params"]
        B, Hi, Wi, _ = x.shape
        if (B // mesh.shape[DATA_AXIS]) % T or B % mesh.shape[DATA_AXIS]:
            raise ValueError(
                f"per-device batch {B}/{mesh.shape[DATA_AXIS]} not "
                f"divisible by pp_microbatch={T}"
            )
        gh, gw = Hi // ps, Wi // ps
        x = patch.apply({"params": p["patch_embed"]}, x)
        x = x.reshape(B, gh * gw, dim)
        cls = p["cls_token"]
        x = jnp.concatenate(
            [jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1
        )
        x = x + p["pos_embed"].astype(x.dtype)
        x = pipelined_blocks(p["blocks"], x)
        x = ln.apply({"params": p["norm"]}, x)
        cls_out = x[:, 0].astype(jnp.float32)
        grid = x[:, 1:].reshape(B, gh, gw, dim)
        logits = classifier.apply({"params": p["classifier"]}, cls_out)
        return (grid, cls_out), logits

    return apply
