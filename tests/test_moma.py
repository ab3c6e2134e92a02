"""MoMA step semantics on the 8-device mesh: EMA ordering, queue
advancement by the GLOBAL batch, shuffle-BN round trip, finite losses,
trainable-set correctness (embed_t EMA-tracked, not SGD-trained)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, MomaConfig
from moma_tpu.core.mesh import data_sharding, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.augment import cifar_eval_normalize
from moma_tpu.models import create_model
from moma_tpu.moma.cmo import CMOHeads
from moma_tpu.moma.queue import QueueState
from moma_tpu.train.distill import probe_shapes
from moma_tpu.train.moma import ema_update, make_moma_train_step
from moma_tpu.train.state import MomaState, make_sgd

B = 16
N_CLS = 10
K = 64
FEAT = 32


def _setup(mesh, mem="MoCo", attn="self", head="mlp"):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(
        feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.99, mem=mem, head=head,
        attn=attn,
    )
    cfg.model_s.n_cls = N_CLS

    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, 32, 32, 3))
    vars_s = model.init(k1, sample, train=False)
    vars_t = model.init(k2, sample, train=False)
    fs, _ = probe_shapes(model, 32, B)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head=head, attn=attn, feat_dim=FEAT, s_dim=s_dim, t_dim=s_dim)
    cmo_params, cmo_bs = heads.init(k3)
    names = ("memory_s", "memory_t") if mem in ("MoCoST", "MoCoSSTT") else ("memory",)
    queue = QueueState.create(k4, K, FEAT, names=names)

    tx = make_sgd(lr_schedule(0.05, 5, 4, cosine=True), 0.9, 5e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
        teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    # steady-state program intended (the cfg default is 'exact', an
    # epoch-loop schedule); the override silences the bare-build warning
    step = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, kl_train_bn_override=True,
    )
    return cfg, state, step


def _batch(mesh, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "image": jax.device_put(
            rs.randint(0, 256, (B, 32, 32, 3), dtype=np.uint8),
            data_sharding(mesh),
        ),
        "label": jax.device_put(
            rs.randint(0, N_CLS, (B,)).astype(np.int32),
            data_sharding(mesh, ndim=1),
        ),
    }


def test_moma_step_basics(mesh8):
    cfg, state, step = _setup(mesh8)
    new_state, metrics = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # queue advanced by the GLOBAL batch (all_k == global batch here)
    assert int(new_state.queue.ptr) == B
    # contrast loss is a (K+1)-way CE: should start near log(K+1)
    assert 0.0 < float(metrics["loss_kd"]) < 3 * np.log(K + 1)


def test_moma_ema_semantics(mesh8):
    cfg, state, step = _setup(mesh8)
    alpha = cfg.moma.alpha
    # expected EMA from the PRE-step student (reference order loops:310)
    want_teacher = jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1 - alpha) * s,
        state.teacher_params,
        state.params["student"],
    )
    new_state, _ = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    got = new_state.teacher_params
    for a, b in zip(
        jax.tree_util.tree_leaves(want_teacher), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # embed_t must equal EMA(embed_t, embed_s), NOT an SGD update
    want_et = jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1 - alpha) * s,
        state.params["cmo"]["embed_t"],
        state.params["cmo"]["embed_s"],
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(want_et),
        jax.tree_util.tree_leaves(new_state.params["cmo"]["embed_t"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_moma_trains_attention_q_only_through_logits(mesh8):
    """atts_q gets gradients; atts_k / atts_queue act on detached keys so
    their grads are zero (reference detaches k in MoCo.forward) — but they
    must still be present in the trainable set."""
    cfg, state, step = _setup(mesh8)
    new_state, _ = step(state, _batch(mesh8), jax.random.PRNGKey(1))

    def delta(tree_a, tree_b):
        return sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)
            )
        )

    assert delta(state.params["cmo"]["atts_q"], new_state.params["cmo"]["atts_q"]) > 0
    assert delta(state.params["student"], new_state.params["student"]) > 0


def test_moma_queue_wraps_after_k_over_b_steps(mesh8):
    cfg, state, step = _setup(mesh8)
    n_steps = K // B + 1
    for i in range(n_steps):
        state, metrics = step(state, _batch(mesh8, seed=i), jax.random.PRNGKey(i))
    assert int(state.queue.ptr) == (n_steps * B) % K


@pytest.mark.parametrize("mem", ["MoCoST"])
def test_moma_st_variant(mesh8, mem):
    cfg, state, step = _setup(mesh8, mem=mem)
    new_state, metrics = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_kd"]))
    assert int(new_state.queue.ptr) == B


@pytest.mark.parametrize("attn", ["all", "qk", "dual", "dual2", "self_qk"])
def test_moma_mocoatt_modes(mesh8, attn):
    """MoCoAtt applies attention INSIDE the queue step (mem_moco.py:110-161)
    — unreachable from the reference CLI, first-class here."""
    cfg, state, step = _setup(mesh8, mem="MoCoAtt", attn=attn)
    new_state, metrics = step(state, _batch(mesh8), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_kd"])), attn
    assert int(new_state.queue.ptr) == B


def test_moma_fast_teacher_mode(mesh8):
    """--fast_teacher: one teacher forward; step runs, KL finite, and the
    logits path differs from the exact 2-forward mode."""
    cfg, state, _ = _setup(mesh8)
    cfg.moma.fast_teacher = True
    heads = CMOHeads("mlp", "self", FEAT, 64, 64)
    step = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, kl_train_bn_override=True,
    )
    new_state, m = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    for k in ("loss", "loss_div", "loss_kd"):
        assert np.isfinite(float(m[k])), k
    assert int(new_state.queue.ptr) == B


def test_moma_losses_descend(mesh8):
    """Training dynamics sanity: 15 steps on a fixed batch must drive the
    total loss down (CE memorization + contrast alignment)."""
    cfg, state, step = _setup(mesh8)
    b = _batch(mesh8)
    losses = []
    for i in range(15):
        state, m = step(state, b, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True


def test_moma_state_checkpoint_roundtrip(mesh8, tmp_path):
    """Full-state save/restore incl. queue memory + pointer + EMA teacher
    — the resume gap the reference leaves open (SURVEY §5)."""
    from moma_tpu.core.checkpoint import CheckpointManager

    cfg, state, step = _setup(mesh8)
    state, _ = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    save = {
        "params": state.params, "batch_stats": state.batch_stats,
        "teacher_params": state.teacher_params,
        "teacher_batch_stats": state.teacher_batch_stats,
        "queue": state.queue, "opt_state": state.opt_state,
        "step": state.step,
    }
    ckpt.save("latest", save, {"epoch": 1})
    restored = ckpt.restore("latest", save)
    assert int(restored["step"]) == 1
    assert int(restored["queue"].ptr) == int(state.queue.ptr)
    np.testing.assert_array_equal(
        np.asarray(restored["queue"].memory["memory"]),
        np.asarray(state.queue.memory["memory"]),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["teacher_params"]),
        jax.tree_util.tree_leaves(state.teacher_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps forward without error
    state2 = state.replace(**restored)
    state3, m = step(state2, _batch(mesh8, seed=5), jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_moma_no_shuffle_bn_matches_with_global_bn(mesh8):
    """With jit's global-batch BN, shuffle-BN must be loss-neutral."""
    cfg1, state1, _ = _setup(mesh8)
    cfg1.moma.shuffle_bn = True
    step1 = make_moma_train_step(
        cfg1, CMOHeads("mlp", "self", FEAT, 64, 64),
        augment_fn=lambda im, r: cifar_eval_normalize(im), donate=False,
        kl_train_bn_override=True,
    )
    cfg2, state2, _ = _setup(mesh8)
    cfg2.moma.shuffle_bn = False
    step2 = make_moma_train_step(
        cfg2, CMOHeads("mlp", "self", FEAT, 64, 64),
        augment_fn=lambda im, r: cifar_eval_normalize(im), donate=False,
        kl_train_bn_override=True,
    )
    b = _batch(mesh8)
    _, m1 = step1(state1, b, jax.random.PRNGKey(3))
    _, m2 = step2(state2, b, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(m1["loss_cls"]), float(m2["loss_cls"]), rtol=1e-5
    )
    # key order is restored by the inverse permutation -> same kd loss
    np.testing.assert_allclose(
        float(m1["loss_kd"]), float(m2["loss_kd"]), rtol=1e-3
    )


def test_moma_sstt_dual_query_route(mesh8):
    """mem=MoCoSSTT routes through step_moco_sstt with the second-view
    dual query (train/moma.py): 4 logit sets, both banks enqueued, loss
    distinct from the ST route."""
    cfg, state, step = _setup(mesh8, mem="MoCoSSTT")
    batch = _batch(mesh8)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_kd"]))
    assert int(new_state.queue.ptr) == B
    ms = np.asarray(new_state.queue.memory["memory_s"][:B])
    mt = np.asarray(new_state.queue.memory["memory_t"][:B])
    # both banks received this step's keys (rows changed from init); with
    # attn='self' they differ (memory_s enqueues atts_k-transformed keys,
    # memory_t the raw teacher-side keys)
    assert not np.allclose(ms, np.asarray(state.queue.memory["memory_s"][:B]))
    assert not np.allclose(mt, np.asarray(state.queue.memory["memory_t"][:B]))

    # with no attention, same-arch k_t falls back to k -> identical rows
    # enter both banks
    cfg_na, state_na, step_na = _setup(mesh8, mem="MoCoSSTT", attn="none")
    ns_na, _ = step_na(state_na, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ns_na.queue.memory["memory_s"][:B]),
        np.asarray(ns_na.queue.memory["memory_t"][:B]), rtol=1e-6,
    )

    # ST on identical inputs takes the single-set (ss) loss: must differ
    # from SSTT's 4-set mean (the in-loop SSTT route is NOT a relabelled ST)
    cfg2, state2, step2 = _setup(mesh8, mem="MoCoST")
    _, metrics_st = step2(state2, batch, jax.random.PRNGKey(1))
    assert abs(float(metrics["loss_kd"]) - float(metrics_st["loss_kd"])) > 1e-6


def test_moma_sstt_second_view_is_live(mesh8):
    """The dual query comes from a SECOND augmented view: making the
    augmentation stochastic must change the SSTT contrast loss but not
    the deterministic-augment baseline's cls loss path."""
    import moma_tpu.data.augment as aug

    def noisy_augment(im, rng):
        x = aug.cifar_eval_normalize(im)
        return x + 0.01 * jax.random.normal(rng, x.shape)

    cfg, state, step = _setup(mesh8, mem="MoCoSSTT")
    batch = _batch(mesh8)
    _, m_det = step(state, batch, jax.random.PRNGKey(1))

    from moma_tpu.train.moma import make_moma_train_step

    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=64, t_dim=64)
    step_noisy = make_moma_train_step(cfg, heads, augment_fn=noisy_augment,
                                      donate=False,
                                      kl_train_bn_override=True)
    cfg2, state2, _ = _setup(mesh8, mem="MoCoSSTT")
    _, m_noise = step_noisy(state2, batch, jax.random.PRNGKey(1))
    # the noisy second view perturbs q_t -> ts/tt logits -> loss_kd
    assert abs(float(m_noise["loss_kd"]) - float(m_det["loss_kd"])) > 1e-7


def test_moma_sstt_cli_reachable():
    from moma_tpu.core.config import parse_student_args

    cfg = parse_student_args(
        ["--distill", "moma", "--mem", "MoCoSSTT", "--model_s", "resnet8",
         "--model_t", "resnet8", "--head", "mlp"]
    )
    assert cfg.moma.mem == "MoCoSSTT"
