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
        donate=False)
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
        donate=False)
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


def test_teacher_quant_cli_flag():
    from moma_tpu.core.config import parse_student_args

    cfg = parse_student_args([
        "--dataset", "synthetic", "--distill", "moma", "--model_s",
        "resnet8", "--model_t", "resnet8", "--teacher_quant", "int8",
    ])
    assert cfg.moma.teacher_quant == "int8"
