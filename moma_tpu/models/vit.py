"""ViT / DeiT family (Flax, NHWC input) — covers the reference's
models/vits/ factories (vit/deit tiny/small/base patch16, 224/384;
model_def.py:78-108).  The reference's ViTs have no is_feat support
(README 'released soon'); here they implement the full feature contract
(feats = (token grid map, pooled cls embedding), logits) so ViTs work as
teachers AND students.

TPU-first: attention over 197 tokens is a pair of MXU matmuls per head;
bf16 throughout with fp32 softmax; static shapes (no interpolation at
runtime — pos-embed resize happens at checkpoint-load time).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from moma_tpu.models.common import TorchLinear


class MHSA(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ jnp.swapaxes(k, -2, -1)) * (hd**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype)(y)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + MHSA(self.dim, self.num_heads, dtype=self.dtype)(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.dim)
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (B, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, gh * gw + 1, self.dim),
        )
        x = x + pos.astype(x.dtype)
        for _ in range(self.depth):
            x = Block(self.dim, self.num_heads, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        cls_out = x[:, 0].astype(jnp.float32)
        # token grid as a spatial feature map (NHWC) for feature-KD losses
        grid = x[:, 1:].reshape(B, gh, gw, self.dim)
        logits = TorchLinear(self.num_classes, name="classifier")(cls_out)
        return (grid, cls_out), logits


def _factory(dim, depth, heads, patch=16):
    def make(num_classes: int = 1000, dtype: Any = None, **kw):
        return VisionTransformer(
            patch_size=patch, dim=dim, depth=depth, num_heads=heads,
            num_classes=num_classes, dtype=dtype, **kw,
        )

    return make


vit_tiny_patch16_224 = _factory(192, 12, 3)
vit_small_patch16_224 = _factory(384, 12, 6)
vit_base_patch16_224 = _factory(768, 12, 12)
deit_tiny_patch16_224 = _factory(192, 12, 3)
deit_small_patch16_224 = _factory(384, 12, 6)
deit_base_patch16_224 = _factory(768, 12, 12)
# 384-input variants (reference model_def.py:78-103): identical
# architecture — the pos-embed grid is sized at init from the actual input
# resolution, and vit_npz.load_npz resizes pretrained 224 position
# embeddings to the new grid (reference _load_weights capability).
vit_tiny_patch16_384 = _factory(192, 12, 3)
vit_base_patch16_384 = _factory(768, 12, 12)
deit_base_patch16_384 = _factory(768, 12, 12)
# commented out in the reference (model_def.py:94-96) but trivially
# supported here — same tiny geometry at 384 input.
deit_tiny_patch16_384 = _factory(192, 12, 3)
