"""CMO — projection heads + batch-token attention (Flax).

Functional port of MoMA/criterion_moco_att.py's CMO parameter container
(:236-338): embed_s/embed_t heads (None | linear | mlp | mlp_byol) and the
timm-style multi-head self-attention whose TOKENS ARE THE BATCH ROWS
(Attention :141-167 — input (N, C) is unsqueezed to (1, N, C); with
attn='self' three separate modules act on q / k / queue).

TPU note: for attn='self' the three attentions over (B, C), (B, C) and
(K, C) are independent softmax-attention programs; the queue one is the
big one (K=16384 tokens).  It lowers to two (K,C)x(C,K) MXU matmuls +
row softmax; fused further in ops/pallas when profiles demand.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.losses.functional import l2_normalize
from moma_tpu.models.common import TorchLinear
from moma_tpu.ops.fused_bn import current_bn_axis


class BatchTokenAttention(nn.Module):
    """MHSA over the batch-as-token axis; input/output (N, C).

    Parity: criterion_moco_att.py:141-167 (num_heads=4, qkv_bias=True for
    CMO; scale = head_dim^-0.5; no residual, no norm).
    `return_attn=True` also returns the (H, N, N) attention map — the
    Attention_viz variant (criterion_moco_att.py:171-197).
    For token counts beyond ~2k (MoCoAtt 'all' mode over 2B+K), route
    through ops/flash_attention.batch_token_attention_big instead.
    """

    dim: int
    num_heads: int = 4
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, return_attn: bool = False):
        N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = TorchLinear(3 * C, use_bias=self.qkv_bias, dtype=self.dtype)(x)
        qkv = qkv.reshape(N, 3, H, hd).transpose(1, 2, 0, 3)  # (3, H, N, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ jnp.swapaxes(k, -2, -1)) * (hd**-0.5)  # (H, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        y = (attn @ v).transpose(1, 0, 2).reshape(N, C)
        out = TorchLinear(C, dtype=self.dtype)(y)
        if return_attn:
            return out, attn
        return out


class BatchTokenAttention2(nn.Module):
    """Attention + residual + LayerNorm (criterion_moco_att.py:227-233)."""

    dim: int
    num_heads: int = 4
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = BatchTokenAttention(
            self.dim, self.num_heads, self.qkv_bias, dtype=self.dtype,
            name="attn_layer",
        )(x)
        return nn.LayerNorm()(y + x)


class ProjectionHead(nn.Module):
    """embed_s / embed_t head (criterion_moco_att.py:254-305).

    head: 'mlp'      Linear(d,d)-ReLU-Linear(d,feat)-L2
          'mlp_byol' Linear(d,d)-BN1d-ReLU-Linear(d,feat)-L2
          'linear'   Linear(d,feat)-L2
          'None'     flatten-L2
    """

    head: str
    feat_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape(x.shape[0], -1)
        if self.head == "mlp":
            d = x.shape[-1]
            x = nn.relu(TorchLinear(d, dtype=self.dtype)(x))
            x = TorchLinear(self.feat_dim, dtype=self.dtype)(x)
        elif self.head == "mlp_byol":
            d = x.shape[-1]
            x = TorchLinear(d, dtype=self.dtype)(x)
            # axis_name read at TRACE time so bn='sync' (the
            # bn_axis_name() context in train/moma.py) also pmeans this
            # 1-D head's stats, not just the backbones' FusedBatchNorms
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=current_bn_axis())(x)
            x = nn.relu(x)
            x = TorchLinear(self.feat_dim, dtype=self.dtype)(x)
        elif self.head == "linear":
            x = TorchLinear(self.feat_dim, dtype=self.dtype)(x)
        elif self.head in ("None", "none", None):
            pass
        else:
            raise ValueError(f"unknown head {self.head}")
        return l2_normalize(x.astype(jnp.float32), axis=1)


# attention-set layouts per opt.attn (criterion_moco_att.py:307-338)
ATTN_SETS = {
    "all": ("atts",),
    "self_mix": ("atts",),
    "qk": ("atts",),
    "dual": ("atts_p", "atts_n"),
    "dual2": ("atts_p", "atts_n"),
    "self_qk": ("atts_q", "atts_k"),
    "self_nomix": ("atts_q", "atts_k"),
    "self_qkv2": ("atts_q", "atts_k"),
    "selfv2": ("atts_q", "atts_k", "atts_queue"),
    "self": ("atts_q", "atts_k", "atts_queue"),
    # the reference's visualization mode (criterion_moco_att.py:330-334):
    # the SAME atts_q/atts_k/atts_queue module set as 'self' (identical
    # parameter layout, so 'self'-trained checkpoints load directly) built
    # from Attention_viz, which also returns the (H, N, N) attention map.
    # Training: ours trains self_viz exactly as 'self'.  (The reference's
    # train loop never applies self_viz modules — its `attn=='self'` guard
    # skips them, leaving the viz heads untrained, and DDP crashes on the
    # unused parameters; a latent defect we do not reproduce.)  Maps come
    # from CMOHeads.attn_maps / test_eval --dump_attn.
    "self_viz": ("atts_q", "atts_k", "atts_queue"),
    "none": (),
}
# modes built from Attention2 (residual+LN) rather than plain Attention
ATTN2_MODES = {"self_qkv2", "selfv2"}


class CMOHeads:
    """Builds + initializes the CMO trainable set for a given config.

    Matches the reference trainable wiring (train_student_moma.py:338-356):
    embed_s and the attention modules train; embed_t is EMA-tracked from
    embed_s when head=='mlp' (loops_moma.py:311-312), otherwise
    parameter-free.
    """

    def __init__(self, head: str, attn: str, feat_dim: int, s_dim: int,
                 t_dim: int, dtype=None, include_ema: bool = False):
        self.head = head
        if attn not in ATTN_SETS:
            # no silent fallback: a typo here would train a DIFFERENT model
            # than asked (the reference's own else-branch coerces unknowns
            # to 'self', criterion_moco_att.py:335-338 — a trap, not a
            # feature; same policy as resolve_pretrain's unknown-tag raise)
            raise ValueError(
                f"unknown attn mode {attn!r}; known: {sorted(ATTN_SETS)}")
        self.attn = attn
        self.feat_dim = feat_dim
        self.dtype = dtype
        self.embed_s = ProjectionHead(head, feat_dim, dtype=dtype)
        self.embed_t = ProjectionHead(head, feat_dim, dtype=dtype)
        # cross-arch (CMO_EmaTec) mode: a third head for the EMA student
        self.embed_ema = (
            ProjectionHead(head, feat_dim, dtype=dtype) if include_ema else None
        )
        att_cls = (
            BatchTokenAttention2 if self.attn in ATTN2_MODES else BatchTokenAttention
        )
        self.attn_modules: Dict[str, nn.Module] = {
            name: att_cls(feat_dim, num_heads=4, qkv_bias=True, dtype=dtype)
            for name in ATTN_SETS[self.attn]
        }
        self._s_dim = s_dim
        self._t_dim = t_dim

    def init(self, rng: jax.Array):
        """Returns (params, batch_stats): embed_s, embed_t[, embed_ema], atts_*."""
        params, batch_stats = {}, {}
        embeds = [("embed_s", self.embed_s, self._s_dim),
                  ("embed_t", self.embed_t, self._t_dim)]
        if self.embed_ema is not None:
            embeds.append(("embed_ema", self.embed_ema, self._s_dim))
        ks = jax.random.split(rng, len(embeds) + len(self.attn_modules))
        for i, (name, mod, dim) in enumerate(embeds):
            v = mod.init(ks[i], jnp.zeros((2, dim)), train=False)
            params[name] = v.get("params", {})
            if "batch_stats" in v:
                batch_stats[name] = v["batch_stats"]
        for i, (name, mod) in enumerate(self.attn_modules.items()):
            v = mod.init(ks[len(embeds) + i], jnp.zeros((2, self.feat_dim)))
            params[name] = v["params"]
        return params, batch_stats

    def attn_fns(self, params: dict, big_n_threshold: int = 2048) -> Dict[str, Callable]:
        """Callables closing over CMO attention params.

        Inputs longer than `big_n_threshold` tokens (MoCoAtt 'all'/'dual'
        attend over 2B+K — dense scores would be O((2B+K)^2) ~ GBs) route
        through the streaming flash-attention op (ops/flash_attention.py).
        """

        def make(name, mod):
            p = params[name]

            def fn(x):
                if x.shape[0] > big_n_threshold and not isinstance(
                    mod, BatchTokenAttention2
                ):
                    from moma_tpu.ops.flash_attention import (
                        batch_token_attention_big,
                    )

                    return batch_token_attention_big(
                        x,
                        p["TorchLinear_0"]["kernel"],
                        p["TorchLinear_0"].get("bias"),
                        p["TorchLinear_1"]["kernel"],
                        p["TorchLinear_1"]["bias"],
                        num_heads=mod.num_heads,
                    )
                return mod.apply({"params": p}, x)

            return fn

        return {name: make(name, mod) for name, mod in self.attn_modules.items()}

    def ring_attn_fns(self, params: dict, axis_name: str) -> Dict[str, Callable]:
        """Callables for the 'model'-sharded bank (shard_map bodies only).

        Each maps (x_rep, x_loc) -> (out_rep, out_loc): attention over
        the token set [replicated x_rep; x_loc sharded over `axis_name`]
        via ring flash attention (ops/ring_attention.py) — the full bank
        is never gathered.  Attention2 modes apply the residual+LayerNorm
        per token afterwards (both are row-local, so they commute with
        the sharding)."""
        from moma_tpu.ops.ring_attention import ring_batch_token_attention

        def make(name, mod):
            p = params[name]
            is2 = isinstance(mod, BatchTokenAttention2)
            ap = p["attn_layer"] if is2 else p

            def fn(x_rep, x_loc):
                out_rep, out_loc = ring_batch_token_attention(
                    x_rep, x_loc,
                    ap["TorchLinear_0"]["kernel"],
                    ap["TorchLinear_0"].get("bias"),
                    ap["TorchLinear_1"]["kernel"],
                    ap["TorchLinear_1"]["bias"],
                    mod.num_heads, axis_name)
                if is2:
                    ln = nn.LayerNorm()
                    lnp = {"params": p["LayerNorm_0"]}
                    out_rep = ln.apply(lnp, out_rep + x_rep)
                    out_loc = ln.apply(lnp, out_loc + x_loc)
                return out_rep, out_loc

            return fn

        return {name: make(name, mod)
                for name, mod in self.attn_modules.items()}

    def attn_maps(self, params: dict, inputs: Dict[str, Any]) -> Dict[str, Any]:
        """Per-module (out, (H, N, N) attention map) — the Attention_viz
        capability (criterion_moco_att.py:171-197, attn='self_viz').

        `inputs` maps module name -> (N, C) tokens (e.g. atts_q: student
        embeds, atts_k: key embeds, atts_queue: queue rows).  Dense-path
        only (viz batches are small; the flash path cannot return maps) —
        cap atts_queue inputs to a few hundred rows before calling.
        Works for any plain-Attention mode ('self', 'self_viz', 'dual',
        ...); Attention2 modes (residual+LN wrapper) expose no map.
        """
        out = {}
        for name, mod in self.attn_modules.items():
            if name not in inputs:
                continue
            if isinstance(mod, BatchTokenAttention2):
                raise ValueError(
                    f"attn mode {self.attn!r} uses Attention2 modules, "
                    "which have no attention-map output")
            y, amap = mod.apply({"params": params[name]}, inputs[name],
                                return_attn=True)
            out[name] = (y, amap)
        return out

    def embed(self, which: str, params: dict, batch_stats: dict, x,
              train: bool = True):
        """Apply embed_s/embed_t/embed_ema; returns (out, new_bs_or_None)."""
        mod = {
            "embed_s": self.embed_s,
            "embed_t": self.embed_t,
            "embed_ema": self.embed_ema,
        }[which]
        variables = {"params": params[which]}
        if which in batch_stats:
            variables["batch_stats"] = batch_stats[which]
            out, mut = mod.apply(variables, x, train=train,
                                 mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return mod.apply(variables, x, train=train), None


class RFFHead(nn.Module):
    """Random-Fourier-Feature projection head (criterion_moco_att.py:35-112,
    RFF/RFF_fixed): out = sqrt(2/in_dim) * cos(x @ W + b), W ~ N(0,1),
    b ~ U(0, 2*pi).  'fixed' keeps one draw for the module's lifetime
    (a non-trainable constant here); non-fixed redraws per call via an rng.
    Optional extra the reference exposes but never reaches from its CLI.

    Reference quirks deliberately not reproduced: `RFF.forward` reads
    `self.in_dim` which its __init__ never sets (AttributeError on first
    call — latent defect), and `RFF_ST` omits the sqrt(2/in_dim) scale.
    This head applies the scale uniformly; RFF_ST's shared-draw semantics
    = calling with the same per-call rng for student and teacher.
    """

    out_dim: int = 128
    w_scale: float = 1.0
    b_scale: float = 1.0
    fixed: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rng: jax.Array | None = None):
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        in_dim = x.shape[-1]
        if self.fixed:
            W = self.variable(
                "constants", "B_w",
                lambda: jax.random.normal(
                    self.make_rng("params"), (in_dim, self.out_dim)
                ) * self.w_scale,
            ).value
            b = self.variable(
                "constants", "B_b",
                lambda: jax.random.uniform(
                    self.make_rng("params"), (1, self.out_dim),
                    minval=0.0, maxval=6.283,
                ) * self.b_scale,
            ).value
        else:
            assert rng is not None, "non-fixed RFF needs a per-call rng"
            k1, k2 = jax.random.split(rng)
            W = jax.random.normal(k1, (in_dim, self.out_dim)) * self.w_scale
            b = jax.random.uniform(k2, (1, self.out_dim), minval=0.0,
                                   maxval=6.283) * self.b_scale
        return (2.0 / in_dim) ** 0.5 * jnp.cos(x @ W + b)


class CMOEmaTecHeads:
    """3-way head set (student / EMA student / teacher) — the reference's
    CMO_EmaTec variant (criterion_moco_att.py:344-419) used for cross-arch
    MoMA where the teacher cannot be EMA'd from the student (e.g. ViT
    teacher, CNN student): the EMA momentum encoder is a SEPARATE copy of
    the student while the fixed teacher contributes its own keys.
    """

    def __init__(self, head: str, feat_dim: int, s_dim: int, t_dim: int,
                 dtype=None):
        self.head = head
        self.feat_dim = feat_dim
        self.embed_s = ProjectionHead(head, feat_dim, dtype=dtype)
        self.embed_ema = ProjectionHead(head, feat_dim, dtype=dtype)
        self.embed_t = ProjectionHead(head, feat_dim, dtype=dtype)
        self._dims = {"embed_s": s_dim, "embed_ema": s_dim, "embed_t": t_dim}

    def init(self, rng: jax.Array):
        params, batch_stats = {}, {}
        for i, (name, mod) in enumerate(
            [("embed_s", self.embed_s), ("embed_ema", self.embed_ema),
             ("embed_t", self.embed_t)]
        ):
            v = mod.init(jax.random.fold_in(rng, i),
                         jnp.zeros((2, self._dims[name])), train=False)
            params[name] = v.get("params", {})
            if "batch_stats" in v:
                batch_stats[name] = v["batch_stats"]
        return params, batch_stats

    def embed(self, which: str, params: dict, x, train: bool = True):
        mod = {"embed_s": self.embed_s, "embed_ema": self.embed_ema,
               "embed_t": self.embed_t}[which]
        return mod.apply({"params": params[which]}, x, train=train)
