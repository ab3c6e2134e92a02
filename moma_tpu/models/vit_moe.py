"""Mixture-of-Experts ViT with expert parallelism over the 'model' axis.

The reference has no MoE (it is a CNN/ViT classifier suite; SURVEY §5
"long-context/sequence parallelism: none — N/A by domain") — this is a
TPU-native scaling capability in the same family as the tensor/sequence/
pipeline-parallel teachers (models/vit_tp.py, vit_pp.py): it completes
the dp/tp/sp/pp/ep sharding alphabet for large KL-teachers.

Design (token-choice top-k routing, GShard/Switch style, all-einsum):

* Every ``moe_every``-th transformer block replaces its dense MLP with
  ``MoEMLP``: a router Dense picks top-k of E expert FFNs per token.
* Dispatch is DENSE one-hot einsum contraction — no gather/scatter
  (per-element gather serializes on TPU, CLAUDE.md measurement lore);
  the (S, E, Cap) dispatch/combine tensors ride the MXU and shard over
  the expert axis.
* Static shapes: expert capacity Cap = ceil(k*S*cf/E) is computed at
  trace time; overflow tokens are DROPPED (their combine weights are
  zero, so they pass through the residual unchanged — the standard
  Switch semantics).
* Router softmax in f32; expert FFNs in the model dtype (bf16 on TPU).
* Load-balance auxiliary loss (Switch eq. 4) is sown into the
  'intermediates' collection as 'moe_aux' — mutable=['intermediates']
  collects it; plain apply() discards it (frozen-teacher use).

Expert parallelism: ``moe_place(params, mesh)`` shards every expert-
indexed parameter P('model', ...) — each chip stores E/M experts — and
``model.clone(ep_mesh=mesh)`` adds in-graph sharding constraints pinning
the dispatched activations (E, Cap, C) to the expert axis, so GSPMD
lowers the dispatch/combine einsums as all-to-all-style collectives over
ICI instead of gathering the expert weights.  Used by run_moma's
``--teacher_parallel expert`` (cross-arch/EmaTec KL teacher).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moma_tpu.core.mesh import MODEL_AXIS
from moma_tpu.models.common import TorchLinear
from moma_tpu.models.vit import MHSA


class MoEMLP(nn.Module):
    """Top-k token-choice MoE FFN (E experts, capacity-factor dispatch)."""

    dim: int
    hidden: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: Any = None
    ep_mesh: Optional[Mesh] = None

    def _ep_shard(self, t):
        if self.ep_mesh is None:
            return t
        spec = P(MODEL_AXIS, *([None] * (t.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(self.ep_mesh, spec)
        )

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        E, k = self.num_experts, self.top_k
        S = B * N
        cap = min(S, max(k, math.ceil(k * S * self.capacity_factor / E)))
        xf = x.reshape(S, C)

        # --- router (f32 for a stable softmax) -------------------------
        wg = self.param(
            "router", nn.initializers.lecun_normal(), (C, E), jnp.float32
        )
        logits = xf.astype(jnp.float32) @ wg
        probs = jax.nn.softmax(logits, axis=-1)  # (S, E)

        vals, idx = jax.lax.top_k(probs, k)  # (S, k)
        if k > 1:
            # GShard top-2: gates renormalized over the chosen experts
            vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
        # k == 1 keeps the RAW router prob as the gate (Switch semantics)
        # — scaling by p is the router's gradient path

        # --- capacity-ordered dispatch/combine (GShard priority: all
        # first choices claim slots before any second choice) -----------
        counts = jnp.zeros((E,), jnp.float32)
        dispatch = jnp.zeros((S, E, cap), jnp.float32)
        combine = jnp.zeros((S, E, cap), jnp.float32)
        for j in range(k):
            oh = jax.nn.one_hot(idx[:, j], E, dtype=jnp.float32)  # (S, E)
            pos_in_e = jnp.cumsum(oh, axis=0) - oh + counts  # (S, E)
            pos = jnp.sum(pos_in_e * oh, axis=-1)  # (S,)
            keep = (pos < cap).astype(jnp.float32)
            slot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                  dtype=jnp.float32) * keep[:, None]
            dj = oh[:, :, None] * slot[:, None, :]  # (S, E, cap)
            dispatch = dispatch + dj
            combine = combine + dj * vals[:, j][:, None, None]
            counts = counts + jnp.sum(oh, axis=0)

        # Switch load-balance loss: E * sum_e(frac_tokens_e * mean_prob_e)
        # over FIRST choices (eq. 4); discarded unless 'intermediates' is
        # mutable
        f_e = jnp.mean(jax.nn.one_hot(idx[:, 0], E, dtype=jnp.float32), 0)
        self.sow("intermediates", "moe_aux", E * jnp.sum(f_e * probs.mean(0)))

        # --- expert FFNs: (E, cap, C) batched einsums on the MXU --------
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(batch_axis=(0,)),
            (E, C, self.hidden), jnp.float32,
        )
        b1 = self.param("b1", nn.initializers.zeros, (E, self.hidden),
                        jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(batch_axis=(0,)),
            (E, self.hidden, C), jnp.float32,
        )
        b2 = self.param("b2", nn.initializers.zeros, (E, C), jnp.float32)

        dt = self.dtype or xf.dtype
        xin = self._ep_shard(
            jnp.einsum("sec,sd->ecd", dispatch.astype(dt), xf.astype(dt))
        )
        h = jnp.einsum("ecd,edf->ecf", xin, w1.astype(dt)) + b1.astype(dt)[
            :, None, :
        ]
        h = self._ep_shard(nn.gelu(h, approximate=False))
        out = jnp.einsum("ecf,efd->ecd", h, w2.astype(dt)) + b2.astype(dt)[
            :, None, :
        ]
        out = self._ep_shard(out)
        y = jnp.einsum("sec,ecd->sd", combine.astype(dt), out)
        return y.reshape(B, N, C)


class MoEBlock(nn.Module):
    dim: int
    num_heads: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    mlp_ratio: float = 4.0
    dtype: Any = None
    ep_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + MHSA(self.dim, self.num_heads, dtype=self.dtype)(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = MoEMLP(
            self.dim, int(self.dim * self.mlp_ratio), self.num_experts,
            top_k=self.top_k, capacity_factor=self.capacity_factor,
            dtype=self.dtype, ep_mesh=self.ep_mesh, name="moe",
        )(y)
        return x + h


class MoEVisionTransformer(nn.Module):
    """VisionTransformer with MoE MLPs in every ``moe_every``-th block
    (GShard interleaving).  Same feature contract as models/vit.py:
    ``((token grid map, pooled cls), logits)``."""

    patch_size: int = 16
    dim: int = 192
    depth: int = 12
    num_heads: int = 3
    num_classes: int = 1000
    num_experts: int = 8
    top_k: int = 1
    capacity_factor: float = 1.25
    moe_every: int = 2
    dtype: Any = None
    ep_mesh: Optional[Mesh] = None

    def is_moe_block(self, i: int) -> bool:
        return (i % self.moe_every) == (self.moe_every - 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from moma_tpu.models.vit import Block

        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.dim),
        )
        x = jnp.concatenate(
            [jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, gh * gw + 1, self.dim),
        )
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            if self.is_moe_block(i):
                x = MoEBlock(
                    self.dim, self.num_heads, self.num_experts,
                    top_k=self.top_k, capacity_factor=self.capacity_factor,
                    dtype=self.dtype, ep_mesh=self.ep_mesh,
                    name=f"Block_{i}",
                )(x)
            else:
                x = Block(self.dim, self.num_heads, dtype=self.dtype,
                          name=f"Block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = x[:, 0].astype(jnp.float32)
        grid = x[:, 1:].reshape(B, gh, gw, self.dim)
        logits = TorchLinear(self.num_classes, name="classifier")(cls_out)
        return (grid, cls_out), logits


def is_moe_model(model) -> bool:
    return isinstance(model, MoEVisionTransformer)


def check_ep_teacher(model, mesh: Mesh, teacher_quant: str = "none") -> None:
    """Raise with a clear message when EP cannot apply to this teacher."""
    mp = mesh.shape[MODEL_AXIS]
    if not is_moe_model(model):
        raise ValueError(
            f"expert-parallel teacher requires a MoE ViT (vit_*_moe*), got "
            f"{type(model).__name__}"
        )
    if model.num_experts % mp != 0:
        raise ValueError(
            f"teacher num_experts={model.num_experts} not divisible by "
            f"model_parallel={mp}"
        )
    if teacher_quant != "none":
        raise ValueError(
            "--teacher_quant does not compose with the expert-parallel MoE "
            "teacher (quantization intercepts nn.Dense/Conv calls; the "
            "expert FFNs are batched einsums over (E, ...) parameters)"
        )


def moe_place(params, mesh: Mesh):
    """Shard every expert-indexed parameter (leading dim == per-block
    num_experts: w1/b1/w2/b2 under a 'moe' submodule) P('model', ...);
    everything else replicated.  One jitted placement program."""
    rep = NamedSharding(mesh, P())

    def spec_tree(tree, in_moe=False):
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = spec_tree(sub, in_moe or name == "moe")
            elif in_moe and name in ("w1", "b1", "w2", "b2"):
                out[name] = NamedSharding(
                    mesh, P(MODEL_AXIS, *([None] * (sub.ndim - 1)))
                )
            else:
                out[name] = rep
        return out

    sh = spec_tree(params)
    return jax.jit(lambda p: p, out_shardings=sh)(params)


def _moe_factory(dim, depth, heads, num_experts=8, patch=16):
    def make(num_classes: int = 1000, dtype: Any = None, **kw):
        return MoEVisionTransformer(
            patch_size=patch, dim=dim, depth=depth, num_heads=heads,
            num_classes=num_classes, num_experts=num_experts, dtype=dtype,
            **kw,
        )

    return make


vit_tiny_moe_patch16_224 = _moe_factory(192, 12, 3)
vit_small_moe_patch16_224 = _moe_factory(384, 12, 6)
