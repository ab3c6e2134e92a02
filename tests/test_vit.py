"""ViT contract + npz checkpoint loading (augreg layout) + pos-embed
resize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moma_tpu.models import create_model


def test_vit_feature_contract():
    m = create_model("vit_tiny_patch16_224", num_classes=10)
    x = jnp.zeros((2, 32, 32, 3))  # 2x2 grid of 16px patches
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    (grid, cls), logits = m.apply(v, x, train=False)
    assert grid.shape == (2, 2, 2, 192)
    assert cls.shape == (2, 192)
    assert logits.shape == (2, 10)


def _fake_augreg_npz(tmp_path, dim=192, depth=12, grid=4, n_cls=7):
    rs = np.random.RandomState(0)
    w = {
        "embedding/kernel": rs.randn(16, 16, 3, dim).astype(np.float32),
        "embedding/bias": rs.randn(dim).astype(np.float32),
        "cls": rs.randn(1, 1, dim).astype(np.float32),
        "Transformer/posembed_input/pos_embedding": rs.randn(
            1, grid * grid + 1, dim
        ).astype(np.float32),
        "Transformer/encoder_norm/scale": rs.randn(dim).astype(np.float32),
        "Transformer/encoder_norm/bias": rs.randn(dim).astype(np.float32),
        "head/kernel": rs.randn(dim, n_cls).astype(np.float32),
        "head/bias": rs.randn(n_cls).astype(np.float32),
    }
    H = 3
    hd = dim // H
    for i in range(depth):
        pre = f"Transformer/encoderblock_{i}"
        w[f"{pre}/LayerNorm_0/scale"] = rs.randn(dim).astype(np.float32)
        w[f"{pre}/LayerNorm_0/bias"] = rs.randn(dim).astype(np.float32)
        w[f"{pre}/LayerNorm_2/scale"] = rs.randn(dim).astype(np.float32)
        w[f"{pre}/LayerNorm_2/bias"] = rs.randn(dim).astype(np.float32)
        for qkv in ("query", "key", "value"):
            w[f"{pre}/MultiHeadDotProductAttention_1/{qkv}/kernel"] = rs.randn(
                dim, H, hd
            ).astype(np.float32)
            w[f"{pre}/MultiHeadDotProductAttention_1/{qkv}/bias"] = rs.randn(
                H, hd
            ).astype(np.float32)
        w[f"{pre}/MultiHeadDotProductAttention_1/out/kernel"] = rs.randn(
            H, hd, dim
        ).astype(np.float32)
        w[f"{pre}/MultiHeadDotProductAttention_1/out/bias"] = rs.randn(
            dim
        ).astype(np.float32)
        w[f"{pre}/MlpBlock_3/Dense_0/kernel"] = rs.randn(dim, 4 * dim).astype(
            np.float32
        )
        w[f"{pre}/MlpBlock_3/Dense_0/bias"] = rs.randn(4 * dim).astype(np.float32)
        w[f"{pre}/MlpBlock_3/Dense_1/kernel"] = rs.randn(4 * dim, dim).astype(
            np.float32
        )
        w[f"{pre}/MlpBlock_3/Dense_1/bias"] = rs.randn(dim).astype(np.float32)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **w)
    return path, w


def test_vit_npz_loading_and_pos_resize(tmp_path):
    from moma_tpu.models.vit_npz import load_vit_npz

    path, w = _fake_augreg_npz(tmp_path, grid=4)  # ckpt grid 4x4
    m = create_model("vit_tiny_patch16_224", num_classes=7)
    x = jnp.zeros((1, 32, 32, 3))  # model grid 2x2 -> needs pos resize
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    v2 = load_vit_npz(v, path)
    assert v2["params"]["pos_embed"].shape == (1, 5, 192)
    # qkv fused correctly: first column of q kernel lands in column 0
    q = w["Transformer/encoderblock_0/MultiHeadDotProductAttention_1/query/kernel"]
    np.testing.assert_allclose(
        np.asarray(v2["params"]["Block_0"]["MHSA_0"]["Dense_0"]["kernel"])[:, 0],
        q.reshape(192, 192)[:, 0],
    )
    # loaded model runs
    (grid, cls), logits = m.apply(v2, x, train=False)
    assert logits.shape == (1, 7)
    assert np.isfinite(np.asarray(logits)).all()
