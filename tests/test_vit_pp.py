"""Pipeline-parallel ViT teacher (models/vit_pp.py): GPipe over the
'model' mesh axis.

The reference has no model parallelism (SURVEY §2.3 — DDP only); this is
a TPU-native scaling capability, the depth-sharded complement to the
tensor-parallel teacher (test_vit_tp.py).  Pinned here:
  * forward parity: PP apply == VisionTransformer.apply for every
    stage-count/microbatch combination (exact block math + batch-only
    microbatching => fp-noise agreement)
  * block stacks really stage (depth/S blocks per device)
  * the compiled SPMD module moves activations with collective-permute
    (the ppermute ring) and never re-gathers the staged weights
  * the cross-arch MoMA step with a PP teacher matches the replicated-
    teacher step loss-for-loss
  * run_moma wires --teacher_parallel pipeline and guards every combo
    where it would silently do nothing
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, MomaConfig, ModelConfig
from moma_tpu.core.mesh import create_mesh, data_sharding
from moma_tpu.models import create_model
from moma_tpu.models.vit_pp import (
    check_pp_teacher, is_pp_model, make_pp_vit_apply, pp_place, pp_stack,
)

from test_vit_tp import _moma_setup, _small_vit, _vit_vars, B, N_CLS


@pytest.mark.parametrize("mp,n_micro", [(2, None), (4, None), (2, 2), (4, 1)])
def test_pp_forward_parity(mp, n_micro):
    mesh = create_mesh(model_parallel=mp)
    model = _small_vit(depth=4)  # depth divisible by every mp here
    v = _vit_vars(model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    (grid, cls), logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(v, x)

    pp = pp_place(v["params"], model, mesh)
    apply = make_pp_vit_apply(model, mesh, n_micro=n_micro)
    (grid2, cls2), logits2 = jax.jit(
        lambda p, x: apply({"params": p}, x, train=False)
    )(pp, jax.device_put(x, data_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grid2), np.asarray(grid),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(cls2), np.asarray(cls),
                               rtol=2e-5, atol=2e-6)


def test_pp_blocks_actually_staged(mesh4x2):
    model = _small_vit(depth=4)
    v = _vit_vars(model)
    pp = pp_place(v["params"], model, mesh4x2)
    lns = pp["blocks"]["LayerNorm_0"]["scale"]
    assert lns.shape[0] == model.depth
    assert lns.addressable_shards[0].data.shape[0] == model.depth // 2
    qkv = pp["blocks"]["MHSA_0"]["Dense_0"]["kernel"]
    assert qkv.shape == (model.depth, model.dim, 3 * model.dim)
    assert qkv.addressable_shards[0].data.shape[0] == model.depth // 2
    # stage order: device s holds blocks [s*L, (s+1)*L)
    b0 = np.asarray(v["params"]["Block_0"]["MHSA_0"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(qkv.addressable_shards[0].data[0]), b0)
    # embedding/epilogue replicated
    pe = pp["pos_embed"]
    assert pe.addressable_shards[0].data.shape == pe.shape


def test_pp_stack_roundtrip_values():
    model = _small_vit(depth=4)
    p = _vit_vars(model)["params"]
    pp = pp_stack(p, model.depth)
    for i in range(model.depth):
        np.testing.assert_array_equal(
            np.asarray(pp["blocks"]["Dense_1"]["kernel"][i]),
            np.asarray(p[f"Block_{i}"]["Dense_1"]["kernel"]),
        )
    assert "Block_0" not in pp


def test_pp_hlo_structure(mesh4x2):
    """The SPMD module must ship activations over the ppermute ring
    (collective-permute) and never all-gather the staged block weights
    back (that would be replicated compute, not a pipeline)."""
    model = _small_vit(depth=4)
    v = _vit_vars(model)
    pp = pp_place(v["params"], model, mesh4x2)
    apply = make_pp_vit_apply(model, mesh4x2)
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        data_sharding(mesh4x2),
    )
    fn = jax.jit(lambda p, x: apply({"params": p}, x, train=False)[1])
    txt = fn.lower(pp, x).compile().as_text()
    assert txt.count("collective-permute(") >= 1, "no ppermute hop compiled"
    assert txt.count("all-gather(") == 0, "staged weights were re-gathered"


def test_pp_guards(mesh4x2):
    model = _small_vit(depth=4)
    with pytest.raises(ValueError, match="depth=3 not divisible"):
        check_pp_teacher(_small_vit(depth=3), mesh4x2, 1)
    with pytest.raises(ValueError, match="ViT family"):
        check_pp_teacher(create_model("resnet8", num_classes=4), mesh4x2, 1)
    with pytest.raises(ValueError, match="teacher_quant"):
        check_pp_teacher(model, mesh4x2, 1, teacher_quant="int8")
    with pytest.raises(ValueError, match="not divisible by pp_microbatch"):
        check_pp_teacher(model, mesh4x2, 3, batch_size=8)
    # trace-time batch guard inside apply itself
    apply = make_pp_vit_apply(model, mesh4x2, n_micro=3)
    v = _vit_vars(model)
    pp = pp_place(v["params"], model, mesh4x2)
    with pytest.raises(ValueError, match="pp_microbatch"):
        jax.jit(lambda p, x: apply({"params": p}, x)[1])(
            pp, jnp.zeros((8, 32, 32, 3)))
    assert is_pp_model(model)
    assert not is_pp_model(create_model("vgg8", num_classes=4))


def test_pp_cross_arch_moma_step_matches_replicated(mesh4x2):
    teacher = _small_vit(depth=4)
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
    from moma_tpu.core.mesh import replicated_sharding

    state_r, step_r = _moma_setup(
        mesh4x2, teacher,
        jax.device_put(vt["params"], replicated_sharding(mesh4x2)),
        teacher.apply,
    )
    pp_params = pp_place(vt["params"], teacher, mesh4x2)
    state_p, step_p = _moma_setup(
        mesh4x2, teacher, pp_params, make_pp_vit_apply(teacher, mesh4x2),
    )
    rng = jax.random.PRNGKey(3)
    new_r, m_r = step_r(state_r, batch, rng)
    new_p, m_p = step_p(state_p, batch, rng)
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        np.testing.assert_allclose(float(m_p[k]), float(m_r[k]), rtol=1e-5,
                                   err_msg=k)
    # PP teacher stayed frozen AND staged through the step
    lns = new_p.teacher_params["blocks"]["LayerNorm_0"]["scale"]
    assert lns.addressable_shards[0].data.shape[0] == teacher.depth // 2
    np.testing.assert_array_equal(
        np.asarray(lns),
        np.asarray(pp_params["blocks"]["LayerNorm_0"]["scale"]),
    )
    np.testing.assert_allclose(
        np.asarray(new_p.queue.memory["memory"]),
        np.asarray(new_r.queue.memory["memory"]), rtol=1e-4, atol=1e-6,
    )


def test_run_moma_wires_pp_teacher(tmp_path, capsys):
    from moma_tpu.train.moma import run_moma

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.image_size = 32
    cfg.run.model_parallel = 2
    cfg.run.teacher_parallel = "pipeline"
    cfg.run.epochs = 1
    cfg.run.save_dir = str(tmp_path)
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=32, nce_k=64, nce_t=0.15, mem="MoCo",
                          head="mlp", attn="self")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="vit_small_patch16_224", n_cls=N_CLS)
    state, _res = run_moma(cfg, synthetic=True)
    lns = state.teacher_params["blocks"]["LayerNorm_0"]["scale"]
    assert lns.shape[0] == 12 and \
        lns.addressable_shards[0].data.shape[0] == 6
    assert "pipeline-parallel" in capsys.readouterr().out

    # pipeline without model parallelism is a silent no-op -> error
    cfg.run.model_parallel = 1
    cfg.run.save_dir = str(tmp_path / "nomp")
    with pytest.raises(ValueError, match="model_parallel > 1"):
        run_moma(cfg, synthetic=True)

    # pipeline + sequence_parallel is contradictory -> error
    cfg.run.model_parallel = 2
    cfg.run.sequence_parallel = True
    cfg.run.save_dir = str(tmp_path / "sp")
    with pytest.raises(ValueError, match="TENSOR-parallel"):
        run_moma(cfg, synthetic=True)

    # pipeline on a non-ViT teacher -> error
    cfg.run.sequence_parallel = False
    cfg.model_t = ModelConfig(name="resnet32", n_cls=N_CLS)
    cfg.run.save_dir = str(tmp_path / "conv_t")
    with pytest.raises(ValueError, match="ViT family"):
        run_moma(cfg, synthetic=True)
