"""bn='local' x --model_parallel for the non-MoCo mem variants (VERDICT
r3 next #3): MoCoST / MoCoSSTT dual banks ride the 'model' axis via
step_moco_{st,sstt}_sharded, and MoCoAtt composes via
step_moco_att_sharded (round 5: queue-consuming attention modes ride
RING flash attention — ops/ring_attention.py — the bank circulates in
shards and is never materialized; qk/self_qk/dual2 never need it).

Oracle: the SAME local-BN step on a data=2 mesh with the replicated
bank(s) — identical protocol to test_moma_local_bn_mp.  Logit values
are bit-identical by construction for the sharded_queue_logits path;
the ring path reassociates the softmax accumulation across shards, so
f32 shard-order noise is the only admissible deviation anywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig
from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
from moma_tpu.models import create_model
from moma_tpu.moma.cmo import CMOHeads
from moma_tpu.moma.queue import QueueState
from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
from moma_tpu.train.state import MomaState, make_sgd

B, HW, N_CLS, FEAT, K, MP = 8, 16, 4, 32, 32, 4
STEPS = 4  # 4*B = 32 = K: full circular pass through the sharded banks


def _cfg(mem, attn):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.999,
                          mem=mem, head="mlp", attn=attn,
                          shuffle_bn=True, kl_teacher_bn="eval")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.run.bn = "local"
    return cfg


def _bank_names(mem):
    return ("memory_s", "memory_t") if mem in ("MoCoST", "MoCoSSTT") \
        else ("memory",)


def _state(mesh, model, cfg):
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 1), sample, train=False)
    heads = CMOHeads(head="mlp", attn=cfg.moma.attn, feat_dim=FEAT,
                     s_dim=64, t_dim=64)
    cmo_params, cmo_bs = heads.init(jax.random.fold_in(rng, 2))
    queue = QueueState.create(jax.random.fold_in(rng, 3), K, FEAT,
                              names=_bank_names(cfg.moma.mem))
    tx = make_sgd(0.05, momentum=0.9, weight_decay=5e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=_teacher_apply(cfg, model),
    )
    return jax.device_put(state, replicated_sharding(mesh)), heads


def _batches(n=STEPS):
    rs = np.random.RandomState(42)
    out = []
    for _ in range(n):
        out.append({
            "image": rs.rand(B, HW, HW, 3).astype(np.float32),
            "label": rs.randint(0, N_CLS, (B,)).astype(np.int32),
            "shuffle_perm": rs.permutation(B).astype(np.int32),
        })
    return out


def _run(mesh, cfg, sharded_queue, n_steps=STEPS):
    model = create_model("resnet8", num_classes=N_CLS)
    state, heads = _state(mesh, model, cfg)
    if sharded_queue:
        state = state.replace(queue=state.queue.replace(memory={
            k: jax.device_put(v, NamedSharding(mesh, P("model", None)))
            for k, v in state.queue.memory.items()
        }))
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None,
                                   donate=False, mesh=mesh)
    losses = []
    for i, b in enumerate(_batches(n_steps)):
        batch = {
            "image": jax.device_put(b["image"], data_sharding(mesh)),
            "label": jax.device_put(b["label"], data_sharding(mesh, ndim=1)),
            "shuffle_perm": jax.device_put(
                b["shuffle_perm"], replicated_sharding(mesh)),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        losses.append({k: float(v) for k, v in metrics.items()})
    return state, losses


def _compare(mem, attn, n_steps=STEPS):
    mesh_1d = create_mesh(jax.devices()[:2])                 # data=2
    mesh_2d = create_mesh(jax.devices(), model_parallel=MP)  # data=2 x model=4
    ref_state, ref_losses = _run(mesh_1d, _cfg(mem, attn), False, n_steps)
    got_state, got_losses = _run(mesh_2d, _cfg(mem, attn), True, n_steps)

    for i in range(n_steps):
        np.testing.assert_allclose(got_losses[i]["loss"],
                                   ref_losses[i]["loss"],
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
    for name in ref_state.queue.memory:
        got_mem = np.asarray(got_state.queue.memory[name])
        assert got_mem.shape == (K, FEAT)
        np.testing.assert_allclose(got_mem,
                                   np.asarray(ref_state.queue.memory[name]),
                                   rtol=2e-4, atol=2e-5)
        sh = got_state.queue.memory[name].sharding
        assert tuple(sh.spec)[:1] == ("model",)
    assert int(got_state.queue.ptr) == int(ref_state.queue.ptr)
    return got_losses


needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


@needs_mesh
def test_mocost_sharded_matches_replicated():
    """Dual student/teacher banks, both 'model'-sharded, full wraparound."""
    _compare("MoCoST", "self")


@needs_mesh
def test_mocosstt_sharded_matches_replicated():
    """Dual banks x dual query: all four logit sets ride the sharded path."""
    _compare("MoCoSSTT", "self")


@needs_mesh
@pytest.mark.parametrize("attn", ["self", "self_qk", "qk", "all", "dual",
                                  "dual2"])
def test_mocoatt_sharded_matches_replicated(attn):
    """MoCoAtt: each attention family composes with the sharded bank —
    'self' (ring atts_queue over bank rows only), 'self_qk'/'qk'
    (sharded logits, bank untransformed), 'all' (ring over [q;k;bank]),
    'dual' (two chained rings), and 'dual2' (no bank read).  2 steps:
    the ring paths are the expensive ones on the CPU mesh."""
    _compare("MoCoAtt", attn, n_steps=2)
