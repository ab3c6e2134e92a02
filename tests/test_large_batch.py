"""Large-global-batch training levers (extensions; the reference's 2-GPU
recipe has none of these): linear LR warmup (core/schedules.py),
LARS trust-ratio scaling (train/state.py make_sgd), and their CLI flags.
All default OFF => reference parity (the existing parity suites pin that).
"""

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.schedules import lr_at_epoch, lr_schedule
from moma_tpu.train.state import make_sgd


def test_warmup_ramp_and_exit():
    base, epochs, spe = 1.0, 10, 10
    sched = lr_schedule(base, epochs, spe, cosine=True, warmup_epochs=2.0)
    plain = lr_schedule(base, epochs, spe, cosine=True)

    # first step: 1/20 of the epoch-1 value
    e1 = lr_at_epoch(1, base, epochs, cosine=True)
    assert np.isclose(float(sched(jnp.int32(0))), e1 * (1 / 20))
    # mid-ramp
    assert np.isclose(float(sched(jnp.int32(9))), e1 * (10 / 20))
    # last warmup step reaches the full epoch-2 value
    e2 = lr_at_epoch(2, base, epochs, cosine=True)
    assert np.isclose(float(sched(jnp.int32(19))), e2)
    # after warmup: untouched reference schedule
    for step in (20, 35, 99):
        s = jnp.int32(step)
        assert np.isclose(float(sched(s)), float(plain(s))), step
        assert np.isclose(
            float(plain(s)),
            lr_at_epoch(step // spe + 1, base, epochs, cosine=True),
        )


def test_warmup_zero_is_reference_parity():
    for cosine in (True, False):
        a = lr_schedule(0.05, 240, 7, cosine=cosine)
        b = lr_schedule(0.05, 240, 7, cosine=cosine, warmup_epochs=0.0)
        for step in (0, 1, 700, 1500):
            assert float(a(jnp.int32(step))) == float(b(jnp.int32(step)))


def test_lars_scales_weights_not_biases():
    lr = 0.1
    trust = 0.01
    tx = make_sgd(lambda s: lr, momentum=0.0, weight_decay=0.0,
                  trust_ratio=trust)
    params = {
        "w": jnp.full((4, 4), 2.0),   # ||w|| = 8
        "b": jnp.full((4,), 2.0),
    }
    grads = {
        "w": jnp.full((4, 4), 0.5),   # ||g|| = 2
        "b": jnp.full((4,), 0.5),
    }
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # weight tensor: -lr * trust*||w||/||g|| * g = -0.1 * 0.01*8/2 * 0.5
    expect_w = -lr * trust * (8.0 / 2.0) * 0.5
    assert np.allclose(np.asarray(updates["w"]), expect_w, rtol=1e-6), (
        np.asarray(updates["w"])[0, 0], expect_w)
    # 1-D param (BN scale / bias): plain SGD update
    assert np.allclose(np.asarray(updates["b"]), -lr * 0.5, rtol=1e-6)


def test_lars_zero_is_plain_sgd():
    lr = 0.1
    plain = make_sgd(lambda s: lr, momentum=0.9, weight_decay=5e-4)
    lars0 = make_sgd(lambda s: lr, momentum=0.9, weight_decay=5e-4,
                     trust_ratio=0.0)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.full((3, 3), 0.2), "b": jnp.full((3,), -0.1)}
    u1, _ = plain.update(grads, plain.init(params), params)
    u2, _ = lars0.update(grads, lars0.init(params), params)
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(u1),
                        jax.tree_util.tree_leaves(u2))
    )


def test_cli_bridge_parses_large_batch_flags():
    from moma_tpu.core.config import parse_teacher_args

    cfg = parse_teacher_args([
        "--model", "resnet8", "--warmup_epochs", "5",
        "--trust_ratio", "0.001", "--grad_clip", "1.0",
    ])
    assert cfg.optim.warmup_epochs == 5.0
    assert cfg.optim.trust_ratio == 0.001
    assert cfg.optim.grad_clip == 1.0
