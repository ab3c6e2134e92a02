"""attn='self_viz' + attention-map dumping + --num_per_class viz subset.

Round-3 closes VERDICT weak #5 / missing viz wiring: unknown --attn must
ERROR (the reference silently coerces to 'self',
criterion_moco_att.py:335-338), self_viz is a real mode (same module
set/params as 'self'; maps via return_attn — Attention_viz,
criterion_moco_att.py:171-197), and test_eval grows the reference's viz
loader (--num_per_class, histo_dataset.py:784-842) + --dump_attn.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig
from moma_tpu.moma.cmo import ATTN_SETS, CMOHeads

B, HW, N_CLS, FEAT, K = 8, 16, 4, 32, 64


def test_unknown_attn_raises():
    with pytest.raises(ValueError, match="unknown attn"):
        CMOHeads(head="mlp", attn="slef", feat_dim=32, s_dim=64, t_dim=64)


def test_cli_rejects_unknown_attn():
    from moma_tpu.core.config import student_parser

    p = student_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--distill", "moma", "--attn", "slef"])


def test_self_viz_in_cli_choices():
    from moma_tpu.core.config import student_parser

    p = student_parser()
    a = p.parse_args(["--distill", "moma", "--attn", "self_viz"])
    assert a.attn == "self_viz"


def test_self_viz_params_match_self():
    """self_viz builds the SAME module set as 'self' — a 'self'-trained
    checkpoint loads into the viz mode unchanged (the reference's whole
    point for Attention_viz's identical parameter layout)."""
    h_self = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=64,
                      t_dim=64)
    h_viz = CMOHeads(head="mlp", attn="self_viz", feat_dim=FEAT, s_dim=64,
                     t_dim=64)
    p1, _ = h_self.init(jax.random.PRNGKey(0))
    p2, _ = h_viz.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.array_equal(a, b)),
                               p1, p2))


def _make_state_and_step(attn):
    from moma_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from moma_tpu.models import create_model
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.999,
                          mem="MoCo", head="mlp", attn=attn,
                          shuffle_bn=False)
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    mesh = create_mesh(jax.devices()[:1])
    model = create_model("resnet8", num_classes=N_CLS)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)
    heads = CMOHeads(head="mlp", attn=attn, feat_dim=FEAT, s_dim=64, t_dim=64)
    cmo_params, cmo_bs = heads.init(jax.random.PRNGKey(2))
    queue = QueueState.create(jax.random.PRNGKey(3), K, FEAT)
    tx = make_sgd(0.05, 0.9, 5e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=_teacher_apply(cfg, model),
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_moma_train_step(cfg, heads, augment_fn=None, donate=False,
                                kl_train_bn_override=True)
    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(rs.rand(B, HW, HW, 3).astype(np.float32),
                                data_sharding(mesh)),
        "label": jax.device_put(rs.randint(0, N_CLS, (B,)).astype(np.int32),
                                data_sharding(mesh, ndim=1)),
    }
    return state, step, batch


def test_self_viz_trains_as_self():
    """One full MoMA step under attn='self_viz' is bit-identical to
    attn='self' (the viz mode deviates only at map-extraction time)."""
    s1, step1, batch = _make_state_and_step("self")
    s2, step2, _ = _make_state_and_step("self_viz")
    rng = jax.random.PRNGKey(9)
    n1, m1 = step1(s1, batch, rng)
    n2, m2 = step2(s2, batch, rng)
    assert float(m1["loss"]) == float(m2["loss"])
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        n1.params, n2.params)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_attn_maps_shapes_and_softmax():
    heads = CMOHeads(head="mlp", attn="self_viz", feat_dim=FEAT, s_dim=64,
                     t_dim=64)
    params, _ = heads.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(B, FEAT).astype(np.float32))
    k = jnp.asarray(rs.randn(B, FEAT).astype(np.float32))
    rows = jnp.asarray(rs.randn(24, FEAT).astype(np.float32))
    maps = heads.attn_maps(params, {"atts_q": q, "atts_k": k,
                                    "atts_queue": rows})
    assert set(maps) == {"atts_q", "atts_k", "atts_queue"}
    out_q, map_q = maps["atts_q"]
    assert out_q.shape == (B, FEAT) and map_q.shape == (4, B, B)
    _, map_queue = maps["atts_queue"]
    assert map_queue.shape == (4, 24, 24)
    np.testing.assert_allclose(np.asarray(map_q).sum(-1), 1.0, atol=1e-5)
    # the map IS the attention the module applies: out == softmax @ v path
    y_plain = heads.attn_modules["atts_q"].apply(
        {"params": params["atts_q"]}, q)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(y_plain),
                               atol=1e-6)


def test_attn2_modes_refuse_maps():
    heads = CMOHeads(head="mlp", attn="selfv2", feat_dim=FEAT, s_dim=64,
                     t_dim=64)
    params, _ = heads.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="no attention-map"):
        heads.attn_maps(params, {"atts_q": jnp.zeros((4, FEAT))})


@pytest.fixture(scope="module")
def moma_run(tmp_path_factory):
    """A fake MoMA run dir: full-state checkpoint + parameters.json —
    what _epoch_loop_moma writes (train/moma.py:1509-1521)."""
    import dataclasses

    from moma_tpu.core.checkpoint import CheckpointManager
    from moma_tpu.models import create_model
    from moma_tpu.moma.queue import QueueState

    root = tmp_path_factory.mktemp("viz_runs")
    run = root / "moma_student"
    model = create_model("resnet8", num_classes=N_CLS)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((2, HW, HW, 3)),
                    train=False)
    vt = model.init(jax.random.PRNGKey(1), jnp.zeros((2, HW, HW, 3)),
                    train=False)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=64,
                     t_dim=64)
    cmo_params, cmo_bs = heads.init(jax.random.PRNGKey(2))
    queue = QueueState.create(jax.random.PRNGKey(3), K, FEAT)
    ckpt = CheckpointManager(str(run / "ckpt"))
    ckpt.save("best_acc", {
        "params": {"student": vs["params"], "cmo": cmo_params},
        "batch_stats": {"student": vs["batch_stats"], "cmo": cmo_bs},
        "teacher_params": vt["params"],
        "teacher_batch_stats": vt["batch_stats"],
        "queue": {"memory": dict(queue.memory), "ptr": queue.ptr},
        "opt_state": {}, "step": 0,
    }, {"epoch": 1, "val_acc": 30.0})
    ckpt.wait()
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, mem="MoCo", head="mlp",
                          attn="self")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)
    with open(run / "parameters.json", "w") as f:
        json.dump({"config": cfg.to_json()}, f)
    return str(root)


def test_dump_attn_and_num_per_class(moma_run, tmp_path):
    from moma_tpu.cli import test_eval

    out = str(tmp_path / "stat.json")
    dump = str(tmp_path / "attn")
    results = test_eval.main([
        "--runs", os.path.join(moma_run, "moma_*"),
        "--model", "resnet8", "--synthetic", "--batch_size", "16",
        "--image_size", str(HW), "--n_cls", str(N_CLS), "--out", out,
        "--num_per_class", "4", "--dump_attn", dump,
    ])
    assert "moma_student" in results
    npz = os.path.join(dump, "moma_student_attn.npz")
    assert os.path.exists(npz)
    data = np.load(npz)
    # 4 samples/class x 4 classes = 16-row batch -> (H=4, 16, 16) maps
    assert data["atts_q_map"].shape == (4, 16, 16)
    assert data["atts_k_map"].shape == (4, 16, 16)
    assert data["atts_queue_map"].shape == (4, K, K)  # K=64 < n_queue cap
    np.testing.assert_allclose(data["atts_q_map"].sum(-1), 1.0, atol=1e-5)
    assert data["labels"].shape[0] == 16


def test_viz_subset_balances_classes():
    from moma_tpu.data.manifests import viz_subset

    rs = np.random.RandomState(0)
    pairs = [(f"p{i}", int(l)) for i, l in enumerate(rs.randint(0, 3, 100))]
    sub = viz_subset(pairs, per_class=5, seed=1)
    counts = {}
    for _, l in sub:
        counts[l] = counts.get(l, 0) + 1
    assert counts == {0: 5, 1: 5, 2: 5}
