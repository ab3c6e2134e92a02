"""One fast smoke per subsystem the quick tier didn't cover (VERDICT r3
weak #7 / next #6): flash attention, int8 quantization, serving export,
TP/PP/MoE ViT teachers, and the native C++ batcher.

These are NOT the subsystems' real tests (each has a full-suite file
with oracles and parity sweeps) — they exist so `pytest -m quick` can
DETECT a break anywhere in `moma_tpu/` before a commit, at seconds per
subsystem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.models import create_model


def test_flash_attention_smoke():
    """Pallas flash forward (interpret mode) == dense softmax, and the
    custom-VJP entry differentiates on the chunked route."""
    from moma_tpu.ops.flash_attention import (flash_attention, pick_blocks,
                                              streaming_attention)

    H, N, d = 2, 256, 16
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(H, N, d), jnp.float32)
    scale = d ** -0.5
    o = flash_attention(q, q, q, scale, block_q=128, block_k=128,
                        interpret=True)
    s = jnp.einsum("hnd,hmd->hnm", q, q) * scale
    want = jnp.einsum("hnm,hmd->hnd", jax.nn.softmax(s, axis=-1), q)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda x: jnp.sum(
        streaming_attention(x, q, q, scale, False, 128) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()

    bq, bk_f, bk_b, npad = pick_blocks(16640)
    assert (bq, bk_f, bk_b, npad) == (256, 4160, 2080, 16640)


def test_quantize_smoke():
    """calibrate + quantized_apply on a tiny conv net: jitted, finite,
    near the fp forward."""
    from moma_tpu.core.quantize import calibrate, quantized_apply

    model = create_model("resnet8", num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    fn = lambda vv, xx: model.apply(vv, xx, train=False)[1]
    scales = calibrate(fn, v, [x])
    assert scales  # every conv got an absmax
    y_q = jax.jit(quantized_apply(fn, scales))(v, x)
    y_fp = fn(v, x)
    assert np.isfinite(np.asarray(y_q)).all()
    assert float(jnp.max(jnp.abs(y_q - y_fp))) < 1.0


def test_export_smoke(tmp_path):
    """StableHLO export round-trip on a tiny model, one batch size."""
    from moma_tpu.core.export import ExportedClassifier, export_classifier
    from moma_tpu.data import augment as aug

    model = create_model("resnet8", num_classes=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   train=False)
    path = export_classifier(model.apply, v, 32, str(tmp_path / "m"),
                             normalize=aug.cifar_eval_normalize,
                             meta={"n_cls": 4})
    clf = ExportedClassifier(path)
    x = np.random.RandomState(1).randint(0, 256, (3, 32, 32, 3), np.uint8)
    got = np.asarray(clf(x))
    _, want = model.apply(v, aug.cifar_eval_normalize(jnp.asarray(x)),
                          train=False)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_vit():
    from moma_tpu.models.vit import VisionTransformer

    vit = VisionTransformer(patch_size=8, dim=16, depth=2, num_heads=4,
                            num_classes=4)
    v = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                 train=False)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3), jnp.float32)
    _, want = vit.apply(v, x, train=False)
    return vit, v, x, np.asarray(want)


def test_vit_tp_smoke(mesh4x2, tiny_vit):
    from moma_tpu.models.vit_tp import make_tp_vit_apply, tp_place

    vit, v, x, want = tiny_vit
    params = tp_place(v["params"], vit, mesh4x2)
    _, logits = make_tp_vit_apply(vit, mesh4x2)(
        {"params": params, "batch_stats": {}}, x, train=False,
        mutable=False)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-5)


def test_vit_pp_smoke(mesh4x2, tiny_vit):
    from moma_tpu.core.mesh import data_sharding
    from moma_tpu.models.vit_pp import make_pp_vit_apply, pp_place

    vit, v, x, want = tiny_vit
    params = pp_place(v["params"], vit, mesh4x2)
    apply = make_pp_vit_apply(vit, mesh4x2)
    _, logits = jax.jit(lambda p, xx: apply({"params": p}, xx, train=False))(
        params, jax.device_put(x, data_sharding(mesh4x2)))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-5)


def test_vit_moe_smoke(mesh4x2):
    from moma_tpu.models.vit_moe import MoEVisionTransformer, moe_place

    moe = MoEVisionTransformer(patch_size=8, dim=16, depth=2, num_heads=2,
                               num_classes=4, num_experts=4,
                               capacity_factor=2.0)
    v = moe.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                 train=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    params = moe_place(v["params"], mesh4x2)
    _, logits = moe.clone(ep_mesh=mesh4x2).apply(
        {"params": params}, x, train=False)
    assert np.isfinite(np.asarray(logits)).all()
    w1 = params["Block_1"]["moe"]["w1"]
    assert w1.addressable_shards[0].data.shape[0] == 2  # E/mp per device


def test_native_batcher_smoke(tmp_path):
    from moma_tpu.data.native import NativeBatcher, get_lib

    if get_lib() is None:
        pytest.skip("no g++ available")
    n, shape = 16, (4, 4, 3)
    data = np.random.RandomState(0).randint(0, 256, (n, *shape),
                                            dtype=np.uint8)
    path = str(tmp_path / "pack.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    b = NativeBatcher(path, n, shape)
    idx = np.asarray([3, 0, 15, 7])
    np.testing.assert_array_equal(b.gather(idx), data[idx])


def test_stem_s2d_exact():
    """Space-to-depth folded stem (layout probe, VERDICT r3 #8): same
    param tree as the standard stem, same math (folded 2x2 s1 conv;
    models/efficientnet.py:_StemConv) at both packing factors."""
    from moma_tpu.models.efficientnet import EfficientNet

    m0 = EfficientNet(variant="b0", num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    t0 = jax.tree_util.tree_structure(v)
    f0, l0 = m0.apply(v, x, train=False)
    for s2d in (2, 4):
        m = EfficientNet(variant="b0", num_classes=4, stem_s2d=s2d)
        assert jax.tree_util.tree_structure(
            m.init(jax.random.PRNGKey(0), x, train=False)) == t0
        f, l = m.apply(v, x, train=False)
        assert float(jnp.linalg.norm(l - l0) /
                     (jnp.linalg.norm(l0) + 1e-9)) < 1e-5
        assert float(jnp.linalg.norm(f[0] - f0[0]) /
                     (jnp.linalg.norm(f0[0]) + 1e-9)) < 1e-5
    # train=True through the folded stem: BN batch-stats mutation and
    # gradients through the .at[].set kernel folds (ADVICE r4 low #2)
    m4 = EfficientNet(variant="b0", num_classes=4, stem_s2d=4)

    def loss_fn(params):
        (_, logits), _ = m4.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(v["params"])
    stem_g = g["Conv_0"]["kernel"]
    assert np.isfinite(np.asarray(stem_g)).all()
    assert float(jnp.sum(jnp.abs(stem_g))) > 0


def test_block_remat_tree_and_grad():
    """block_remat=True must keep the param tree byte-identical to the
    standard model (nn.checkpoint renames the class; we pin the
    standard auto-name — ADVICE r4 high) and accept standard-init
    params under grad with BN mutation."""
    from moma_tpu.models.efficientnet import EfficientNet

    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    m0 = EfficientNet(variant="b0", num_classes=4)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    mr = EfficientNet(variant="b0", num_classes=4, block_remat=True)
    vr = mr.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(vr)
            == jax.tree_util.tree_structure(v0))
    # standard-init params flow through the remat model (values equal)
    _, l0 = m0.apply(v0, x, train=False)
    _, lr = mr.apply(v0, x, train=False)
    assert float(jnp.linalg.norm(lr - l0) /
                 (jnp.linalg.norm(l0) + 1e-9)) < 1e-6

    def loss_fn(params):
        (_, logits), _ = mr.apply(
            {"params": params, "batch_stats": v0["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(v0["params"])
    total = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))
    assert np.isfinite(total) and total > 0
