"""Tensor-parallel ViT teacher (models/vit_tp.py): Megatron-style TP over
the 'model' mesh axis.

The reference has no model parallelism (SURVEY §2.3 — DDP only); this is
a TPU-native scaling capability.  Pinned here:
  * forward parity: TP apply == VisionTransformer.apply (feats + logits)
  * weights really shard (1/M of heads / MLP hidden per device)
  * the compiled SPMD module contains the per-block all-reduces and NO
    weight re-gather (GSPMD partitioned the compute, not the storage)
  * the cross-arch MoMA step with a TP teacher matches the replicated-
    teacher step loss-for-loss
  * run_moma wires TP automatically for ViT teachers at model_parallel>1
    and guards the invalid combos
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, MomaConfig, ModelConfig
from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.augment import cifar_eval_normalize
from moma_tpu.models import create_model
from moma_tpu.models.vit import VisionTransformer
from moma_tpu.models.vit_tp import (
    check_tp_teacher, is_tp_model, make_tp_vit_apply, tp_convert, tp_place,
)
from moma_tpu.moma.cmo import CMOHeads
from moma_tpu.moma.queue import QueueState
from moma_tpu.train.distill import probe_shapes
from moma_tpu.train.moma import make_moma_train_step
from moma_tpu.train.state import MomaState, make_sgd

B, N_CLS, K, FEAT = 16, 6, 64, 32


def _small_vit(num_heads=4, dim=32, depth=2):
    return VisionTransformer(patch_size=8, dim=dim, depth=depth,
                             num_heads=num_heads, num_classes=N_CLS)


def _vit_vars(model, seed=0):
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)),
                      train=False)


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_forward_parity(mp):
    mesh = create_mesh(model_parallel=mp)
    model = _small_vit()
    v = _vit_vars(model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    (grid, cls), logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(v, x)

    tp = tp_place(v["params"], model, mesh)
    apply = make_tp_vit_apply(model, mesh)
    (grid2, cls2), logits2 = jax.jit(
        lambda p, x: apply({"params": p}, x, train=False)
    )(tp, jax.device_put(x, data_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grid2), np.asarray(grid),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(cls2), np.asarray(cls),
                               rtol=2e-5, atol=2e-6)


def test_tp_weights_actually_sharded(mesh4x2):
    model = _small_vit()
    v = _vit_vars(model)
    tp = tp_place(v["params"], model, mesh4x2)
    H, hd, C = model.num_heads, model.dim // model.num_heads, model.dim
    qk = tp["Block_0"]["attn"]["q_kernel"]
    assert qk.shape == (C, H, hd)
    assert qk.addressable_shards[0].data.shape == (C, H // 2, hd)
    mlp = tp["Block_1"]["Dense_0"]["kernel"]
    assert mlp.addressable_shards[0].data.shape == (C, int(C * 4.0) // 2)
    down = tp["Block_1"]["Dense_1"]["kernel"]
    assert down.addressable_shards[0].data.shape == (int(C * 4.0) // 2, C)
    # replicated leaves stay whole
    pe = tp["pos_embed"]
    assert pe.addressable_shards[0].data.shape == pe.shape


def test_tp_hlo_partitions_compute(mesh4x2):
    """The SPMD module must all-reduce partial results (sharded compute),
    never all-gather the sharded weights back (replicated compute)."""
    model = _small_vit(depth=3)
    v = _vit_vars(model)
    tp = tp_place(v["params"], model, mesh4x2)
    apply = make_tp_vit_apply(model, mesh4x2)
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        data_sharding(mesh4x2),
    )
    fn = jax.jit(lambda p, x: apply({"params": p}, x, train=False)[1])
    txt = fn.lower(tp, x).compile().as_text()
    n_ar = txt.count("all-reduce(")
    assert n_ar >= model.depth, f"expected per-block all-reduces, got {n_ar}"
    assert txt.count("all-gather(") == 0, "sharded weights were re-gathered"


@pytest.mark.parametrize("mp", [2, 4])
def test_sp_forward_parity(mp):
    """Sequence-parallel TP (token-sharded residual stream) must match the
    dense forward exactly like plain TP does."""
    mesh = create_mesh(model_parallel=mp)
    model = _small_vit()
    v = _vit_vars(model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    (grid, cls), logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(v, x)

    tp = tp_place(v["params"], model, mesh)
    apply = make_tp_vit_apply(model, mesh, sequence_parallel=True)
    (grid2, cls2), logits2 = jax.jit(
        lambda p, x: apply({"params": p}, x, train=False)
    )(tp, jax.device_put(x, data_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grid2), np.asarray(grid),
                               rtol=2e-5, atol=2e-6)


def test_sp_hlo_structure(mesh4x2):
    """SP must keep the compute head/hidden-sharded (the per-block
    all-reduces survive — left to propagation alone GSPMD instead
    re-gathers the small weights and drops to AR=1) and add the token
    resharding traffic (all-gathers in front of qkv / MLP-up).  On this
    CPU backend the partial->token-sharded resharding lowers as
    all-reduce + slice rather than reduce-scatter (verified: even the
    canonical one-matmul RS case lowers to AR on CPU), so the pinned
    structure is AR >= 2*depth AND AG >= 2*depth; sp=False has AG == 0
    (test_tp_hlo_partitions_compute)."""
    model = _small_vit(depth=3)
    v = _vit_vars(model)
    tp = tp_place(v["params"], model, mesh4x2)
    apply = make_tp_vit_apply(model, mesh4x2, sequence_parallel=True)
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        data_sharding(mesh4x2),
    )
    fn = jax.jit(lambda p, x: apply({"params": p}, x, train=False)[1])
    txt = fn.lower(tp, x).compile().as_text()
    n_ar = txt.count("all-reduce(")
    n_ag = txt.count("all-gather(")
    assert n_ar >= 2 * model.depth, (
        f"compute de-sharded (weight-gather fallback): AR={n_ar}")
    assert n_ag >= 2 * model.depth, f"no SP token resharding: AG={n_ag}"
    # the sharded weights themselves must never be re-gathered: every
    # all-gather output in the SP program is an activation with leading
    # batch dim B=8 (the weight-gather fallback shows f32[32,4,8] /
    # f32[32,128] / f32[128,32] kernel gathers)
    import re
    for shape in re.findall(r"all-gather\.?\d* = f32\[([\d,]+)\]", txt):
        assert shape.startswith("8,"), f"weight re-gathered: f32[{shape}]"


def test_tp_convert_roundtrip_values():
    """q/k/v/proj splits must index the fused layout exactly (3-major
    [3, H, hd] column ordering of the qkv Dense, models/vit.py:36)."""
    model = _small_vit()
    p = _vit_vars(model)["params"]
    tp = tp_convert(p, model.num_heads)
    C, H = model.dim, model.num_heads
    hd = C // H
    fused = np.asarray(p["Block_0"]["MHSA_0"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(tp["Block_0"]["attn"]["k_kernel"]),
        fused.reshape(C, 3, H, hd)[:, 1],
    )
    fused_b = np.asarray(p["Block_0"]["MHSA_0"]["Dense_0"]["bias"])
    np.testing.assert_array_equal(
        np.asarray(tp["Block_0"]["attn"]["v_bias"]),
        fused_b.reshape(3, H, hd)[2],
    )
    proj = np.asarray(p["Block_0"]["MHSA_0"]["Dense_1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(tp["Block_0"]["attn"]["proj_kernel"]),
        proj.reshape(H, hd, C),
    )


def _moma_setup(mesh, teacher, teacher_params, teacher_apply):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.99,
                          mem="MoCo", head="mlp", attn="self")
    cfg.model_s.n_cls = N_CLS

    student = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    k1, k3, k4 = jax.random.split(rng, 3)
    vars_s = student.init(k1, jnp.zeros((2, 32, 32, 3)), train=False)
    fs, _ = probe_shapes(student, 32, B)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT,
                     s_dim=fs[-1][-1], t_dim=teacher.dim, include_ema=True)
    cmo_params, cmo_bs = heads.init(k3)
    queue = QueueState.create(k4, K, FEAT)
    tx = make_sgd(lr_schedule(0.05, 5, 4, cosine=True), 0.9, 5e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=None, teacher_batch_stats={},
        queue=queue, opt_state=tx.init(params),
        ema_params=vars_s["params"], ema_batch_stats=vars_s["batch_stats"],
        tx=tx, apply_fn=student.apply, teacher_apply_fn=teacher_apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    state = state.replace(teacher_params=teacher_params)
    step = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, cross_arch=True, kl_train_bn_override=True,
    )
    return state, step


def test_tp_cross_arch_moma_step_matches_replicated(mesh4x2):
    teacher = _small_vit()
    vt = _vit_vars(teacher, seed=7)
    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (B, 32, 32, 3), dtype=np.uint8),
            data_sharding(mesh4x2),
        ),
        "label": jax.device_put(
            rs.randint(0, N_CLS, (B,)).astype(np.int32),
            data_sharding(mesh4x2, ndim=1),
        ),
    }
    # replicated baseline
    state_r, step_r = _moma_setup(
        mesh4x2, teacher,
        jax.device_put(vt["params"], replicated_sharding(mesh4x2)),
        teacher.apply,
    )
    # TP teacher
    tp_params = tp_place(vt["params"], teacher, mesh4x2)
    state_t, step_t = _moma_setup(
        mesh4x2, teacher, tp_params, make_tp_vit_apply(teacher, mesh4x2),
    )
    rng = jax.random.PRNGKey(3)
    new_r, m_r = step_r(state_r, batch, rng)
    new_t, m_t = step_t(state_t, batch, rng)
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        np.testing.assert_allclose(float(m_t[k]), float(m_r[k]), rtol=1e-5,
                                   err_msg=k)
    # TP teacher stayed frozen AND sharded through the step
    qk = new_t.teacher_params["Block_0"]["attn"]["q_kernel"]
    assert qk.sharding.spec[1] == "model"
    np.testing.assert_array_equal(
        np.asarray(qk), np.asarray(tp_params["Block_0"]["attn"]["q_kernel"])
    )
    # queue advanced identically
    np.testing.assert_allclose(
        np.asarray(new_t.queue.memory["memory"]),
        np.asarray(new_r.queue.memory["memory"]), rtol=1e-4, atol=1e-6,
    )


def test_check_tp_teacher_guards(mesh4x2):
    with pytest.raises(ValueError, match="not divisible"):
        check_tp_teacher(_small_vit(num_heads=3, dim=33), mesh4x2)
    with pytest.raises(ValueError, match="ViT family"):
        check_tp_teacher(create_model("resnet8", num_classes=4), mesh4x2)
    with pytest.raises(ValueError, match="teacher_quant"):
        check_tp_teacher(_small_vit(), mesh4x2, teacher_quant="int8")
    assert is_tp_model(_small_vit())
    assert not is_tp_model(create_model("vgg8", num_classes=4))


def test_run_moma_wires_tp_teacher(tmp_path, capsys):
    """run_moma with --model_parallel 2 and a ViT teacher must (a) train,
    (b) actually shard the teacher, (c) reject the 3-head vit_tiny."""
    from moma_tpu.train.moma import run_moma

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.image_size = 32
    cfg.run.model_parallel = 2
    cfg.run.epochs = 1
    cfg.run.save_dir = str(tmp_path)
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=64, nce_t=0.15, mem="MoCo",
                          head="mlp", attn="self")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="vit_small_patch16_224", n_cls=N_CLS)
    state, _res = run_moma(cfg, synthetic=True)
    qk = state.teacher_params["Block_0"]["attn"]["q_kernel"]
    assert qk.sharding.spec[1] == "model"
    assert qk.addressable_shards[0].data.shape[1] == qk.shape[1] // 2
    out = capsys.readouterr().out
    assert "tensor-parallel" in out

    cfg.model_t = ModelConfig(name="vit_tiny_patch16_224", n_cls=N_CLS)
    cfg.run.save_dir = str(tmp_path / "t2")
    with pytest.raises(ValueError, match="num_heads=3 not divisible"):
        run_moma(cfg, synthetic=True)


def test_run_moma_sequence_parallel(tmp_path, capsys):
    """--sequence_parallel trains through run_moma on the TP ViT teacher
    and is rejected wherever it would silently do nothing."""
    from moma_tpu.train.moma import run_moma

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.image_size = 32
    cfg.run.model_parallel = 2
    cfg.run.sequence_parallel = True
    cfg.run.epochs = 1
    cfg.run.save_dir = str(tmp_path)
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=64, nce_t=0.15, mem="MoCo",
                          head="mlp", attn="self")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="vit_small_patch16_224", n_cls=N_CLS)
    state, _res = run_moma(cfg, synthetic=True)
    assert "sequence-parallel" in capsys.readouterr().out

    # SP without model parallelism is a silent no-op -> error
    cfg.run.model_parallel = 1
    cfg.run.save_dir = str(tmp_path / "nomp")
    with pytest.raises(ValueError, match="model_parallel > 1"):
        run_moma(cfg, synthetic=True)

    # SP on a non-ViT (non-TP) teacher -> error
    cfg.run.model_parallel = 2
    cfg.model_t = ModelConfig(name="resnet32", n_cls=N_CLS)
    cfg.run.save_dir = str(tmp_path / "conv_t")
    with pytest.raises(ValueError, match="sequence_parallel"):
        run_moma(cfg, synthetic=True)
