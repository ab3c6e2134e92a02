"""Cross-arch MoMA (EmaTec mode): ViT-style mismatched teacher with a CNN
student — BASELINE config #5.  Verifies: EMA tracks the STUDENT copy (not
the teacher), the fixed teacher's params never change, dual-bank MoCoST
fills memory_t with teacher keys."""

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
from moma_tpu.train.moma import make_moma_train_step
from moma_tpu.train.state import MomaState, make_sgd

B, N_CLS, K, FEAT = 16, 10, 64, 32


def _setup(mesh, mem="MoCo", fast_teacher=False):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=0.15, alpha=0.99,
                          mem=mem, head="mlp", attn="self",
                          fast_teacher=fast_teacher)
    cfg.model_s.n_cls = N_CLS

    student = create_model("resnet8", num_classes=N_CLS)
    teacher = create_model("vgg8", num_classes=N_CLS)  # different arch
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, 32, 32, 3))
    vars_s = student.init(k1, sample, train=False)
    vars_t = teacher.init(k2, sample, train=False)
    fs, _ = probe_shapes(student, 32, B)
    ft, _ = probe_shapes(teacher, 32, B)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT,
                     s_dim=fs[-1][-1], t_dim=ft[-1][-1], include_ema=True)
    cmo_params, cmo_bs = heads.init(k3)
    names = ("memory_s", "memory_t") if mem in ("MoCoST", "MoCoSSTT") else ("memory",)
    queue = QueueState.create(k4, K, FEAT, names=names)
    tx = make_sgd(lr_schedule(0.05, 5, 4, cosine=True), 0.9, 5e-4)
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": vars_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        queue=queue, opt_state=tx.init(params),
        ema_params=vars_s["params"], ema_batch_stats=vars_s["batch_stats"],
        tx=tx, apply_fn=student.apply, teacher_apply_fn=teacher.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, cross_arch=True, kl_train_bn_override=True,
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


def test_cross_arch_step_and_invariants(mesh8):
    cfg, state, step = _setup(mesh8)
    new_state, m = step(state, _batch(mesh8), jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isfinite(float(m[k])), k
    # fixed teacher params untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(state.teacher_params),
        jax.tree_util.tree_leaves(new_state.teacher_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA copy = alpha*ema + (1-alpha)*student(pre-step)
    want = jax.tree_util.tree_map(
        lambda e, s: 0.99 * e + 0.01 * s,
        state.ema_params, state.params["student"],
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(want),
        jax.tree_util.tree_leaves(new_state.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    assert int(new_state.queue.ptr) == B


def test_cross_arch_mocost_dual_banks(mesh8):
    cfg, state, step = _setup(mesh8, mem="MoCoST")
    new_state, m = step(state, _batch(mesh8), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss_kd"]))
    # both banks advanced with DIFFERENT keys (ema-student vs teacher)
    ms = np.asarray(new_state.queue.memory["memory_s"])[:B]
    mt = np.asarray(new_state.queue.memory["memory_t"])[:B]
    assert np.abs(ms - mt).sum() > 1e-3


def test_cross_arch_ignores_fast_teacher(mesh8):
    """--fast_teacher reuses the momentum ENCODER's logits for KL, which is
    meaningless when the KL teacher is a different architecture: cross-arch
    mode must fall back to the real teacher forward (regression: this
    combination used to trace with logit_t=None and crash)."""
    cfg, state, step = _setup(mesh8, fast_teacher=True)
    new_state, metrics = step(state, _batch(mesh8), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_div"]))
