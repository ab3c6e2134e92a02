"""Mixture-of-Experts ViT + expert parallelism (models/vit_moe.py).

The reference has no MoE (SURVEY §5 — CNN/ViT classifier suite); this is
a TPU-native scaling capability completing the dp/tp/sp/pp/ep alphabet.
Pinned here:
  * routing semantics: E=1 reduces exactly to a dense (gated) MLP;
    top-2 gates renormalize; capacity overflow drops tokens to zero
    (identity through the block residual)
  * the load-balance aux loss is sown and finite
  * expert parallelism: weights really shard E/M per device and the
    sharded forward matches the replicated one
  * run_moma wires --teacher_parallel expert (cross-arch KL teacher) and
    check_ep_teacher guards the invalid combos
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.mesh import create_mesh
from moma_tpu.models import create_model
from moma_tpu.models.vit_moe import (
    MoEMLP,
    MoEVisionTransformer,
    check_ep_teacher,
    is_moe_model,
    moe_place,
)

N_CLS = 6


def _small_moe(num_experts=4, top_k=1, cf=2.0, depth=2, dim=32, heads=2,
               moe_every=2):
    return MoEVisionTransformer(
        patch_size=8, dim=dim, depth=depth, num_heads=heads,
        num_classes=N_CLS, num_experts=num_experts, top_k=top_k,
        capacity_factor=cf, moe_every=moe_every,
    )


def test_registry_and_feature_contract():
    m = create_model("vit_tiny_moe_patch16_224", num_classes=N_CLS)
    assert is_moe_model(m) and m.num_experts == 8
    # MoE blocks interleave GShard-style: odd blocks are MoE
    assert not m.is_moe_block(0) and m.is_moe_block(1)

    small = _small_moe()
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    v = small.init(jax.random.PRNGKey(0), x, train=False)
    (grid, cls), logits = jax.jit(
        lambda v, x: small.apply(v, x, train=False))(v, x)
    assert grid.shape == (4, 4, 4, 32)
    assert cls.shape == (4, 32)
    assert logits.shape == (4, N_CLS)
    assert np.isfinite(np.asarray(logits)).all()


def test_single_expert_is_dense_mlp():
    """E=1: every token routes to expert 0 with gate = softmax(1 logit)
    = 1.0 and capacity >= S — the MoE layer must equal the plain MLP."""
    mlp = MoEMLP(dim=16, hidden=32, num_experts=1, capacity_factor=1.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 16))
    v = mlp.init(jax.random.PRNGKey(3), x)
    y = mlp.apply(v, x)

    p = v["params"]
    xf = x.reshape(-1, 16)
    ref = jax.nn.gelu(xf @ p["w1"][0] + p["b1"][0], approximate=False)
    ref = (ref @ p["w2"][0] + p["b2"][0]).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_capacity_overflow_drops_tokens():
    """cap < S/E forces drops: dropped tokens produce EXACTLY zero (they
    pass through the transformer block residual unchanged)."""
    S, E = 64, 2
    mlp = MoEMLP(dim=8, hidden=16, num_experts=E, capacity_factor=0.25)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, S, 8))
    v = mlp.init(jax.random.PRNGKey(5), x)
    y = np.asarray(mlp.apply(v, x))[0]
    nonzero_rows = int((np.abs(y).sum(-1) > 0).sum())
    cap = max(1, int(np.ceil(S * 0.25 / E)))
    assert nonzero_rows <= E * cap
    assert nonzero_rows > 0


def test_top2_gates_renormalize():
    """top_k=2 with ample capacity: per-token combine mass == 1 (GShard
    renormalized gates), i.e. the MoE output is a convex combination."""
    mlp = MoEMLP(dim=8, hidden=16, num_experts=4, top_k=2,
                 capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 8))
    v = mlp.init(jax.random.PRNGKey(7), x)

    # reconstruct the combine mass by feeding constant-1 expert outputs:
    # y(x) with w2=0,b2=1 equals sum_e,c combine[s,e,c] per token
    p = jax.tree_util.tree_map(jnp.copy, v["params"])
    p["w2"] = jnp.zeros_like(p["w2"])
    p["b2"] = jnp.ones_like(p["b2"])
    y = np.asarray(mlp.apply({"params": p}, x))[0]
    np.testing.assert_allclose(y, np.ones_like(y), rtol=1e-5, atol=1e-5)


def test_aux_loss_sown():
    small = _small_moe()
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 32, 32, 3))
    v = small.init(jax.random.PRNGKey(9), x, train=False)
    _, inter = small.apply(v, x, train=False, mutable=["intermediates"])
    leaves = jax.tree_util.tree_leaves(inter)
    assert len(leaves) == 1  # one MoE block in depth=2, moe_every=2
    assert np.isfinite(float(leaves[0])) and float(leaves[0]) > 0


@pytest.mark.parametrize("mp", [2, 4])
def test_expert_parallel_matches_replicated(mp):
    mesh = create_mesh(model_parallel=mp)
    model = _small_moe(num_experts=4, cf=4.0)
    x = jax.random.uniform(jax.random.PRNGKey(10), (8, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(11), x, train=False)
    (_, cls), logits = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(v, x)

    ep_params = moe_place(v["params"], mesh)
    w1 = ep_params["Block_1"]["moe"]["w1"]
    assert w1.addressable_shards[0].data.shape[0] == 4 // mp
    ep_model = model.clone(ep_mesh=mesh)
    (_, cls2), logits2 = jax.jit(
        lambda p, x: ep_model.apply({"params": p}, x, train=False)
    )(ep_params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(cls2),
                               rtol=2e-5, atol=2e-5)


def test_check_ep_teacher_guards():
    mesh = create_mesh(model_parallel=2)
    from moma_tpu.models.vit import VisionTransformer

    dense = VisionTransformer(patch_size=8, dim=32, depth=2, num_heads=2,
                              num_classes=N_CLS)
    with pytest.raises(ValueError, match="MoE ViT"):
        check_ep_teacher(dense, mesh)
    odd = _small_moe(num_experts=3)
    with pytest.raises(ValueError, match="not divisible"):
        check_ep_teacher(odd, mesh)
    ok = _small_moe(num_experts=4)
    check_ep_teacher(ok, mesh)
    with pytest.raises(ValueError, match="teacher_quant"):
        check_ep_teacher(ok, mesh, teacher_quant="int8")


def test_moma_step_with_expert_parallel_teacher():
    """Cross-arch MoMA step with an expert-parallel MoE KL-teacher over
    the ('data','model') mesh — the --teacher_parallel expert path."""
    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.core.mesh import data_sharding, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_eval_normalize
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    B, K, FEAT = 8, 32, 16
    mesh = create_mesh(model_parallel=2)
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.999,
                          mem="MoCo", head="mlp", attn="self")
    cfg.model_s.n_cls = N_CLS

    student = create_model("resnet8", num_classes=N_CLS)
    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                      train=False)
    teacher = _small_moe(num_experts=4, cf=4.0)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                      train=False)
    fs, _ = probe_shapes(student, 32, B)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=s_dim,
                     t_dim=teacher.dim, include_ema=True)
    hp, hbs = heads.init(jax.random.PRNGKey(2))
    params = {"student": sv["params"], "cmo": hp}
    tx = make_sgd(lr_schedule(0.05, 2, 2, cosine=True), 0.9, 5e-4)
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": sv["batch_stats"], "cmo": hbs},
        teacher_params=None, teacher_batch_stats={},
        queue=QueueState.create(jax.random.PRNGKey(3), K, FEAT),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, sv["params"]),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, sv["batch_stats"]),
        tx=tx, apply_fn=student.apply,
        teacher_apply_fn=teacher.clone(ep_mesh=mesh).apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    state = state.replace(teacher_params=moe_place(tv["params"], mesh))

    step = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, cross_arch=True, kl_train_bn_override=True,
    )
    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (B, 32, 32, 3), dtype=np.uint8),
            data_sharding(mesh)),
        "label": jax.device_put(rs.randint(0, N_CLS, (B,)).astype(np.int32),
                                data_sharding(mesh, ndim=1)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    loss_ep = float(metrics["loss"])
    assert np.isfinite(loss_ep)
    assert int(new_state.queue.ptr) == B

    # replicated-teacher oracle: same step, no EP placement
    state_rep = state.replace(
        teacher_params=jax.device_put(
            tv["params"], replicated_sharding(mesh)),
        teacher_apply_fn=teacher.apply,
    )
    step_rep = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, cross_arch=True, kl_train_bn_override=True,
    )
    _, metrics_rep = step_rep(state_rep, batch, jax.random.PRNGKey(4))
    np.testing.assert_allclose(loss_ep, float(metrics_rep["loss"]),
                               rtol=2e-5)


def test_run_moma_guards_expert_without_mp():
    from moma_tpu.core.config import parse_student_args

    cfg = parse_student_args(
        ["--distill", "moma", "--teacher_parallel", "expert",
         "--dataset", "synthetic", "--n_cls", str(N_CLS),
         "--model_s", "resnet8", "--model_t", "vit_tiny_moe_patch16_224"]
    )
    assert cfg.run.teacher_parallel == "expert"
    from moma_tpu.train.moma import run_moma

    with pytest.raises(ValueError, match="model_parallel"):
        run_moma(cfg, synthetic=True)
