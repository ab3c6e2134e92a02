"""bn='local' shard_map MoMA step parity vs a REAL 2-rank gloo reference.

The reference's distributed semantics — per-GPU BatchNorm statistics,
Shuffle-BN's cross-rank permutation (contrast_trainer.py:90-133), DDP
gradient averaging — are exercised here with two actual gloo processes
(tests/ref_moma_2rank_worker.py), and compared against our shard_map
execution mode on a 2-device slice of the virtual CPU mesh:

  * loss_cls / loss_div / loss_kd / total  (mean of the ranks' local
    losses == our pmean'd metrics)
  * averaged student + CMO-head gradients
  * post-step queue memory (the reference enqueues in shuffled order,
    ours in original order — permutation-equivalent sets; compared via
    the shared permutation) and pointer (advances by the GLOBAL batch)
  * EMA teacher parameters
  * BN running statistics: ours pmean'd == mean of the ranks' per-rank
    stats (the EMA write is linear, so averaging commutes step-wise)

Also: bn='sync' equals bn='global' numerics, and bn='local' actually
responds to the shuffle permutation (the leakage defense is real).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "MoMA")),
    reason="reference tree not available",
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, HW, N_CLS = 8, 32, 10
S_DIM = 64
FEAT = 32
K, T_NCE = 64, 0.15
ALPHA = 0.999
C_CLS, C_DIV, C_BETA = 1.0, 1.0, 1.0
KD_T = 4.0
LR = 0.1
# crosses the rank boundary: rows move between the two half-batches, so
# per-rank BN groupings actually change (the point of Shuffle-BN)
PERM = np.array([5, 2, 7, 0, 3, 6, 1, 4], dtype=np.int64)


@pytest.fixture(scope="module")
def two_rank_ref(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("gloo2"))
    rs = np.random.RandomState(3)
    images = rs.rand(B, 3, HW, HW).astype(np.float32)
    labels = rs.randint(0, N_CLS, (B,)).astype(np.int64)
    memory = rs.randn(K, FEAT).astype(np.float32)
    memory /= np.linalg.norm(memory, axis=1, keepdims=True)
    np.savez(
        os.path.join(tmp, "inputs.npz"),
        images=images, labels=labels, memory=memory, perm=PERM,
        n_cls=N_CLS, feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
        cdb=np.array([C_CLS, C_DIV, C_BETA]), kd_t=KD_T,
    )
    worker = os.path.join(os.path.dirname(__file__), "ref_moma_2rank_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), "2", tmp, "29531"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            pytest.skip(f"2-rank gloo worker {r} failed:\n{out[-2000:]}")
    ranks = [
        torch.load(os.path.join(tmp, f"out_rank{r}.pt"), weights_only=False)
        for r in range(2)
    ]
    return {
        "images": images, "labels": labels, "memory": memory, "ranks": ranks,
    }


def _build_state(snap, memory_np, mesh):
    from moma_tpu.models import create_model
    from moma_tpu.models.torch_import import convert_state_dict
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.core.mesh import replicated_sharding
    from moma_tpu.train.state import MomaState, make_sgd

    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 1), sample, train=False)
    conv_s = convert_state_dict(snap["model_s"], vars_s)
    conv_t = convert_state_dict(snap["model_t"], vars_t)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM)
    cmo_params, cmo_bs = heads.init(jax.random.fold_in(rng, 2))
    conv_cmo = convert_state_dict(snap["cmo"], {"params": cmo_params})["params"]
    queue = QueueState(
        memory={"memory": jnp.asarray(memory_np)},
        ptr=jnp.zeros((), jnp.int32),
    )
    tx = make_sgd(LR, momentum=0.0, weight_decay=0.0)
    params = {"student": conv_s["params"], "cmo": conv_cmo}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": conv_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=conv_t["params"],
        teacher_batch_stats=conv_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    return state, heads, conv_s, conv_t, conv_cmo


def _step_cfg(bn: str, head: str = "mlp"):
    from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=C_CLS, div=C_DIV,
                                beta=C_BETA, kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head=head, attn="self",
                          shuffle_bn=True, kl_teacher_bn="eval")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.run.bn = bn
    return cfg


@pytest.fixture(scope="module")
def local_bn_ours(two_rank_ref):
    from moma_tpu.core.mesh import create_mesh, data_sharding
    from moma_tpu.train.moma import make_moma_train_step

    snap = two_rank_ref["ranks"][0]["snap"]
    mesh = create_mesh(jax.devices()[:2])
    state, heads, conv_s, conv_t, conv_cmo = _build_state(
        snap, two_rank_ref["memory"], mesh
    )
    cfg = _step_cfg("local")
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False,
                                   mesh=mesh)
    batch = {
        "image": jax.device_put(
            np.transpose(two_rank_ref["images"], (0, 2, 3, 1)),
            data_sharding(mesh),
        ),
        "label": jax.device_put(
            two_rank_ref["labels"].astype(np.int32), data_sharding(mesh, ndim=1)
        ),
        "shuffle_perm": jax.device_put(PERM.astype(np.int32)),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
    return state, new_state, metrics, conv_s, conv_t, conv_cmo


def test_losses_match_rank_mean(two_rank_ref, local_bn_ours):
    ranks = two_rank_ref["ranks"]
    _, _, metrics, _, _, _ = local_bn_ours
    want = np.mean([r["losses"] for r in ranks], axis=0)  # cls, div, kd, tot
    np.testing.assert_allclose(float(metrics["loss_cls"]), want[0], rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_div"]), want[1], rtol=2e-3,
                               atol=1e-6)
    np.testing.assert_allclose(float(metrics["loss_kd"]), want[2], rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss"]), want[3], rtol=2e-4)


def test_queue_matches_modulo_shuffle(two_rank_ref, local_bn_ours):
    ranks = two_rank_ref["ranks"]
    _, new_state, _, _, _, _ = local_bn_ours
    assert int(new_state.queue.ptr) == ranks[0]["post_ptr"] == B
    ours = np.asarray(new_state.queue.memory["memory"])
    ref = ranks[0]["post_memory"]
    # reference enqueues all_k in SHUFFLED order (contrast_trainer returns
    # all_k pre-unshuffle); ours enqueues original order — same rows as a set
    np.testing.assert_allclose(ours[:B][PERM], ref[:B], rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(ours[B:], ref[B:], rtol=1e-5, atol=1e-7)


def _tree_close(got_tree, want_tree, rtol, atol, tag):
    flat_want = jax.tree_util.tree_leaves_with_path(want_tree)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, got_tree)
    ))
    assert flat_want
    for path, want in flat_want:
        np.testing.assert_allclose(
            flat_got[path], want, rtol=rtol, atol=atol,
            err_msg=f"{tag}{path}",
        )


def test_grads_match_ddp_average(two_rank_ref, local_bn_ours):
    from moma_tpu.models.torch_import import convert_state_dict

    ranks = two_rank_ref["ranks"]
    state, new_state, _, conv_s, conv_t, conv_cmo = local_bn_ours

    def derived(old, new):
        return jax.tree_util.tree_map(
            lambda o, n: (np.asarray(o, np.float32)
                          - np.asarray(n, np.float32)) / LR,
            old, new,
        )

    ref_g = convert_state_dict(
        ranks[0]["grads_s"],
        {"params": conv_s["params"], "batch_stats": conv_s["batch_stats"]},
    )["params"]
    _tree_close(derived(state.params["student"], new_state.params["student"]),
                ref_g, rtol=5e-3, atol=2e-5, tag="student")

    g_cmo = derived(state.params["cmo"], new_state.params["cmo"])
    ref_gc = convert_state_dict(
        ranks[0]["grads_cmo"], {"params": conv_cmo}
    )["params"]
    for name in ("embed_s", "atts_q"):
        _tree_close(g_cmo[name], ref_gc[name], rtol=5e-3, atol=2e-5, tag=name)
    for name in ("atts_k", "atts_queue"):
        for leaf in jax.tree_util.tree_leaves(g_cmo[name]):
            np.testing.assert_allclose(leaf, 0.0, atol=1e-7)


def test_ema_teacher_and_bn_stats(two_rank_ref, local_bn_ours):
    from moma_tpu.models.torch_import import convert_state_dict

    ranks = two_rank_ref["ranks"]
    _, new_state, _, conv_s, conv_t, _ = local_bn_ours

    conv_post = [
        convert_state_dict(
            r["post_teacher"],
            {"params": conv_t["params"], "batch_stats": conv_t["batch_stats"]},
        )
        for r in ranks
    ]
    # EMA params: identical on both ranks (DDP-identical weights)
    _tree_close(new_state.teacher_params, conv_post[0]["params"],
                rtol=1e-4, atol=1e-6, tag="teacher")
    # teacher BN running stats: per-rank local-batch stats in the reference;
    # ours pmean'd == the rank mean (linear EMA write commutes with the mean)
    mean_bs = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2.0,
        conv_post[0]["batch_stats"], conv_post[1]["batch_stats"],
    )
    _tree_close(new_state.teacher_batch_stats, mean_bs,
                rtol=1e-3, atol=1e-5, tag="teacher_bs")

    conv_post_s = [
        convert_state_dict(
            r["post_student"],
            {"params": conv_s["params"], "batch_stats": conv_s["batch_stats"]},
        )
        for r in ranks
    ]
    mean_bs_s = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2.0,
        conv_post_s[0]["batch_stats"], conv_post_s[1]["batch_stats"],
    )
    _tree_close(new_state.batch_stats["student"], mean_bs_s,
                rtol=1e-3, atol=1e-5, tag="student_bs")


# ---------------------------------------------------------- cheap invariants


def _mini_setup(bn: str, mesh, perm=None, seed=3, head="mlp"):
    from moma_tpu.core.mesh import data_sharding
    from moma_tpu.train.moma import make_moma_train_step

    rs = np.random.RandomState(seed)
    images = rs.rand(B, HW, HW, 3).astype(np.float32)
    labels = rs.randint(0, N_CLS, (B,)).astype(np.int32)
    memory = rs.randn(K, FEAT).astype(np.float32)
    memory /= np.linalg.norm(memory, axis=1, keepdims=True)

    # initial weights straight from our own init (no torch needed here)
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.core.mesh import replicated_sharding
    from moma_tpu.train.state import MomaState, make_sgd

    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 1), sample, train=False)
    heads = CMOHeads(head=head, attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM)
    cmo_params, cmo_bs = heads.init(jax.random.fold_in(rng, 2))
    queue = QueueState(
        memory={"memory": jnp.asarray(memory)}, ptr=jnp.zeros((), jnp.int32)
    )
    tx = make_sgd(LR, momentum=0.0, weight_decay=0.0)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    cfg = _step_cfg(bn, head=head)
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False,
                                   mesh=mesh)
    batch = {
        "image": jax.device_put(images, data_sharding(mesh)),
        "label": jax.device_put(labels, data_sharding(mesh, ndim=1)),
    }
    if perm is not None:
        batch["shuffle_perm"] = jax.device_put(perm.astype(np.int32))
    return step_fn, state, batch


def test_sync_equals_global(mesh8):
    """bn='sync' (per-device execution + stat pmean) must reproduce the
    jit global-batch numerics."""
    mesh2 = __import__("moma_tpu.core.mesh", fromlist=["create_mesh"]).create_mesh(
        jax.devices()[:2]
    )
    fn_g, st_g, b_g = _mini_setup("global", mesh2)
    fn_s, st_s, b_s = _mini_setup("sync", mesh2)
    _, m_g = fn_g(st_g, b_g, jax.random.PRNGKey(7))
    _, m_s = fn_s(st_s, b_s, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_s["loss"]), float(m_g["loss"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(m_s["loss_kd"]), float(m_g["loss_kd"]),
                               rtol=1e-3)


def test_sync_equals_global_byol_head(mesh8):
    """The mlp_byol projection head uses plain flax BatchNorm (1-D); under
    bn='sync' its stats must join the cross-device pmean like every
    backbone FusedBatchNorm (regression: the bn_axis_name() context only
    covered FusedBatchNorm, leaving the head's BN per-device)."""
    from moma_tpu.core.mesh import create_mesh

    mesh2 = create_mesh(jax.devices()[:2])
    fn_g, st_g, b_g = _mini_setup("global", mesh2, head="mlp_byol")
    fn_s, st_s, b_s = _mini_setup("sync", mesh2, head="mlp_byol")
    _, m_g = fn_g(st_g, b_g, jax.random.PRNGKey(7))
    _, m_s = fn_s(st_s, b_s, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_s["loss"]), float(m_g["loss"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(m_s["loss_kd"]), float(m_g["loss_kd"]),
                               rtol=1e-3)


def test_local_bn_shuffle_matters(mesh8):
    """With per-device BN, the shuffle permutation changes the keys (the
    leakage defense is real); with global BN it cannot."""
    from moma_tpu.core.mesh import create_mesh

    mesh2 = create_mesh(jax.devices()[:2])
    ident = np.arange(B)
    fn_l, st_l, b_id = _mini_setup("local", mesh2, perm=ident)
    _, m_ident = fn_l(st_l, b_id, jax.random.PRNGKey(7))
    fn_l2, st_l2, b_pm = _mini_setup("local", mesh2, perm=PERM)
    _, m_perm = fn_l2(st_l2, b_pm, jax.random.PRNGKey(7))
    assert abs(float(m_ident["loss_kd"]) - float(m_perm["loss_kd"])) > 1e-6

    fn_g, st_g, bg_id = _mini_setup("global", mesh2, perm=ident)
    _, g_ident = fn_g(st_g, bg_id, jax.random.PRNGKey(7))
    fn_g2, st_g2, bg_pm = _mini_setup("global", mesh2, perm=PERM)
    _, g_perm = fn_g2(st_g2, bg_pm, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(g_ident["loss_kd"]),
                               float(g_perm["loss_kd"]), rtol=1e-6)
