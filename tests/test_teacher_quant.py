"""Opt-in dynamic-int8 teacher forwards in the MoMA step
(cfg.moma.teacher_quant='int8', train/moma.py::_teacher_apply).

The teacher (KL scorer + momentum key encoder) is gradient-free — all
its outputs are stop_gradient'ed — so quantizing its convs perturbs
targets/keys only.  These tests pin: the wrap is ACTIVE (losses move),
bounded (same loss scale), trainable (student grads flow, losses
descend), and rejected when the Pallas fused_teacher would bypass it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.train.moma import _teacher_apply, make_moma_train_step
from tests.test_moma import _batch, _setup


def _heads(state):
    """Rebuild the CMOHeads _setup used (head=mlp, attn=self, FEAT=32)."""
    from moma_tpu.moma.cmo import CMOHeads

    # mlp head: TorchLinear_0 is Linear(s_dim, s_dim) (cmo.py mlp)
    s_dim = state.params["cmo"]["embed_s"]["TorchLinear_0"]["kernel"].shape[0]
    return CMOHeads(head="mlp", attn="self", feat_dim=32, s_dim=s_dim,
                    t_dim=s_dim)


def test_teacher_quant_active_and_bounded(mesh8):
    from moma_tpu.data.augment import cifar_eval_normalize

    cfg, state, step = _setup(mesh8)
    batch = _batch(mesh8)
    rng = jax.random.PRNGKey(1)
    _, m_fp = step(state, batch, rng)

    cfg.moma.teacher_quant = "int8"

    class _T:
        apply = staticmethod(state.teacher_apply_fn)

    qstate = state.replace(teacher_apply_fn=_teacher_apply(cfg, _T))
    qstep = make_moma_train_step(
        cfg, _heads(state), augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, kl_train_bn_override=True)
    _, m_q = qstep(qstate, batch, rng)

    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isfinite(float(m_q[k])), (k, m_q[k])
    # ACTIVE: int8 teacher must move the KL/contrast losses...
    assert float(m_q["loss"]) != float(m_fp["loss"])
    # ...but stay a small perturbation, not a different objective
    assert abs(float(m_q["loss"]) - float(m_fp["loss"])) < 0.25 * float(
        m_fp["loss"])
    # the pure-student CE term sees identical inputs -> unchanged
    np.testing.assert_allclose(float(m_q["loss_cls"]),
                               float(m_fp["loss_cls"]), rtol=1e-5)


def test_teacher_quant_losses_descend(mesh8):
    from moma_tpu.data.augment import cifar_eval_normalize

    cfg, state, _ = _setup(mesh8)
    cfg.moma.teacher_quant = "int8"

    class _T:
        apply = staticmethod(state.teacher_apply_fn)

    state = state.replace(teacher_apply_fn=_teacher_apply(cfg, _T))
    step = make_moma_train_step(
        cfg, _heads(state), augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, kl_train_bn_override=True)
    batch = _batch(mesh8)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses  # student learns through int8 targets
    # queue advanced by 6 global batches, wrapping at K=64: 96 % 64
    assert int(state.queue.ptr) == (6 * batch["image"].shape[0]) % 64


def test_teacher_quant_rejects_fused_teacher():
    from moma_tpu.core.config import Config

    cfg = Config()
    cfg.moma.teacher_quant = "int8"
    cfg.moma.fused_teacher = "on"

    class _T:
        apply = staticmethod(lambda *a, **k: None)

    with pytest.raises(ValueError, match="fused_teacher"):
        _teacher_apply(cfg, _T)


def test_teacher_quant_under_local_bn_shard_map(mesh8):
    """teacher_quant composes with the per-device-BN execution mode:
    the conv interception happens at trace time INSIDE the shard_map
    body (each virtual device quantizes its own shard's activations)."""
    from moma_tpu.data.augment import cifar_eval_normalize

    cfg, state, _ = _setup(mesh8)
    cfg.run.bn = "local"
    cfg.moma.teacher_quant = "int8"

    class _T:
        apply = staticmethod(state.teacher_apply_fn)

    state = state.replace(teacher_apply_fn=_teacher_apply(cfg, _T))
    step = make_moma_train_step(
        cfg, _heads(state), augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, mesh=mesh8, kl_train_bn_override=True)
    new_state, metrics = step(state, _batch(mesh8), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.queue.ptr) == _batch(mesh8)["image"].shape[0]


def test_teacher_quant_distill_path(mesh8):
    """The comparison-distiller path honors teacher_quant too: int8
    teacher feats/logits change the KD loss but not the CE term."""
    from moma_tpu.core.config import Config, DistillConfig
    from moma_tpu.core.mesh import data_sharding, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.models import create_model
    from moma_tpu.train.distill import (Distiller, make_distill_train_step,
                                        probe_shapes)
    from moma_tpu.train.state import DistillState, make_sgd
    from moma_tpu.train.student import _teacher_apply_cfg

    B, N_CLS = 16, 10
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="kd", cls=1.0, div=1.0, beta=0.0)
    cfg.model_s.n_cls = N_CLS

    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 32, 32, 3))
    vars_s = model.init(jax.random.fold_in(rng, 1), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 2), sample, train=False)
    fs, _ = probe_shapes(model, 32, B)
    distiller = Distiller(cfg, fs, fs, n_data=64, batch_size=B)
    aux_params, aux_bs = distiller.init_aux(jax.random.fold_in(rng, 3))
    tx = make_sgd(lr_schedule(0.05, 2, 2, cosine=True), 0.9, 5e-4)
    params = {"student": vars_s["params"], "aux": aux_params}

    def make_state(tq):
        cfg.moma.teacher_quant = tq
        st = DistillState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats={"student": vars_s["batch_stats"], "aux": aux_bs},
            teacher_params=vars_t["params"],
            teacher_batch_stats=vars_t["batch_stats"],
            opt_state=tx.init(params),
            extra=distiller.init_extra(jax.random.fold_in(rng, 4)), tx=tx,
            apply_fn=model.apply,
            teacher_apply_fn=_teacher_apply_cfg(cfg, model),
        )
        return jax.device_put(st, replicated_sharding(mesh8))

    step = make_distill_train_step(distiller, augment_fn=None, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        # normalized floats: raw uint8 saturates the teacher softmax to
        # an exact one-hot, hiding any logit perturbation from the KL
        "image": jax.device_put(
            (rs.randint(0, 256, (B, 32, 32, 3)) / 255.0).astype(np.float32),
            data_sharding(mesh8)),
        "label": jax.device_put(rs.randint(0, N_CLS, (B,)).astype(np.int32),
                                data_sharding(mesh8, ndim=1)),
    }
    _, m_fp = step(make_state("none"), batch, jax.random.PRNGKey(7))
    _, m_q = step(make_state("int8"), batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m_q["loss"]))
    assert float(m_q["loss_div"]) != float(m_fp["loss_div"])  # active
    np.testing.assert_allclose(float(m_q["loss_cls"]),
                               float(m_fp["loss_cls"]), rtol=1e-5)


def test_teacher_quant_cli_flag():
    from moma_tpu.core.config import parse_student_args

    cfg = parse_student_args([
        "--dataset", "synthetic", "--distill", "moma", "--model_s",
        "resnet8", "--model_t", "resnet8", "--teacher_quant", "int8",
    ])
    assert cfg.moma.teacher_quant == "int8"
