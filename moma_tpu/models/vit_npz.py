"""ViT .npz checkpoint loading + position-embedding resize.

The reference's ViT stack loads the original JAX-format npz checkpoints
(augreg/big_vision layout) into torch (models/vits/vits_source.py:456+,
resize_pos_embed :535).  Here they load natively — same npz names mapped
onto moma_tpu.models.vit.VisionTransformer — including bilinear grid
resize of the position embedding for image-size changes.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def resize_pos_embed(pos: np.ndarray, new_len: int) -> np.ndarray:
    """(1, 1+old_grid^2, D) -> (1, 1+new_grid^2, D), bilinear over the grid
    (vits_source.py:535 semantics; cls token kept)."""
    cls_tok, grid = pos[:, :1], pos[:, 1:]
    old = int(math.sqrt(grid.shape[1]))
    new = int(math.sqrt(new_len - 1))
    if old == new:
        return pos
    g = grid.reshape(1, old, old, -1)
    g = jax.image.resize(jnp.asarray(g), (1, new, new, g.shape[-1]), "bilinear")
    return np.concatenate([cls_tok, np.asarray(g).reshape(1, new * new, -1)], axis=1)


def load_vit_npz(variables: Dict, path: str) -> Dict:
    """Map an augreg-layout npz into the Flax ViT's variables."""
    w = np.load(path)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def get(name):
        return w[name]

    params["patch_embed"]["kernel"] = get("embedding/kernel")
    params["patch_embed"]["bias"] = get("embedding/bias")
    params["cls_token"] = get("cls")
    pos = get(
        "Transformer/posembed_input/pos_embedding"
        if "Transformer/posembed_input/pos_embedding" in w
        else "pos_embedding"
    )
    params["pos_embed"] = resize_pos_embed(pos, params["pos_embed"].shape[1])

    depth = sum(1 for k in params if k.startswith("Block_"))
    for i in range(depth):
        blk = params[f"Block_{i}"]
        pre = f"Transformer/encoderblock_{i}"
        ln0 = blk["LayerNorm_0"]
        ln0["scale"] = get(f"{pre}/LayerNorm_0/scale")
        ln0["bias"] = get(f"{pre}/LayerNorm_0/bias")
        attn = blk["MHSA_0"]
        D = attn["Dense_0"]["kernel"].shape[0]
        # augreg stores q/k/v as (D, H, hd); fuse into our (D, 3D) qkv
        q = get(f"{pre}/MultiHeadDotProductAttention_1/query/kernel").reshape(D, D)
        k = get(f"{pre}/MultiHeadDotProductAttention_1/key/kernel").reshape(D, D)
        v = get(f"{pre}/MultiHeadDotProductAttention_1/value/kernel").reshape(D, D)
        attn["Dense_0"]["kernel"] = np.concatenate([q, k, v], axis=1)
        qb = get(f"{pre}/MultiHeadDotProductAttention_1/query/bias").reshape(-1)
        kb = get(f"{pre}/MultiHeadDotProductAttention_1/key/bias").reshape(-1)
        vb = get(f"{pre}/MultiHeadDotProductAttention_1/value/bias").reshape(-1)
        attn["Dense_0"]["bias"] = np.concatenate([qb, kb, vb])
        attn["Dense_1"]["kernel"] = get(
            f"{pre}/MultiHeadDotProductAttention_1/out/kernel"
        ).reshape(D, D)
        attn["Dense_1"]["bias"] = get(
            f"{pre}/MultiHeadDotProductAttention_1/out/bias"
        )
        ln1 = blk["LayerNorm_1"]
        ln1["scale"] = get(f"{pre}/LayerNorm_2/scale")
        ln1["bias"] = get(f"{pre}/LayerNorm_2/bias")
        blk["Dense_0"]["kernel"] = get(f"{pre}/MlpBlock_3/Dense_0/kernel")
        blk["Dense_0"]["bias"] = get(f"{pre}/MlpBlock_3/Dense_0/bias")
        blk["Dense_1"]["kernel"] = get(f"{pre}/MlpBlock_3/Dense_1/kernel")
        blk["Dense_1"]["bias"] = get(f"{pre}/MlpBlock_3/Dense_1/bias")

    params["norm"]["scale"] = get("Transformer/encoder_norm/scale")
    params["norm"]["bias"] = get("Transformer/encoder_norm/bias")
    if "head/kernel" in w and params["classifier"]["kernel"].shape == w["head/kernel"].shape:
        params["classifier"]["kernel"] = get("head/kernel")
        params["classifier"]["bias"] = get("head/bias")

    out = dict(variables)
    out["params"] = params
    return out
