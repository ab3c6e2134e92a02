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


def _mk_batch(mesh, b=16, n_cls=10, seed=0):
    from moma_tpu.core.mesh import data_sharding

    rs = np.random.RandomState(seed)
    return {
        "image": jax.device_put(
            rs.randint(0, 256, (b, 32, 32, 3), dtype=np.uint8),
            data_sharding(mesh)),
        "label": jax.device_put(
            rs.randint(0, n_cls, (b,)).astype(np.int32),
            data_sharding(mesh, ndim=1)),
    }


def test_remat_vanilla_numerics_identical(mesh8):
    """--remat recomputes the same ops: params/metrics must match the
    plain step to float tolerance (it is a memory lever, not a math one),
    and it must compose with grad_accum."""
    from moma_tpu.core.mesh import replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_eval_normalize
    from moma_tpu.models import create_model
    from moma_tpu.train.state import TrainState
    from moma_tpu.train.steps import make_vanilla_train_step

    model = create_model("resnet8", num_classes=10)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False)

    def mk_state():
        tx = make_sgd(lr_schedule(0.1, 4, 4, cosine=True), 0.9, 5e-4)
        st = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        return jax.device_put(st, replicated_sharding(mesh8))

    aug = lambda im, rng: cifar_eval_normalize(im)
    batch = _mk_batch(mesh8)
    rng = jax.random.PRNGKey(2)
    s_plain, m_plain = make_vanilla_train_step(aug, donate=False)(
        mk_state(), batch, rng)
    s_remat, m_remat = make_vanilla_train_step(aug, donate=False, remat=True)(
        mk_state(), batch, rng)
    assert np.isclose(float(m_plain["loss"]), float(m_remat["loss"]),
                      rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_remat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # composes with grad_accum
    s_both, m_both = make_vanilla_train_step(
        aug, donate=False, grad_accum=2, remat=True)(mk_state(), batch, rng)
    assert np.isfinite(float(m_both["loss"]))


def test_remat_moma_numerics_identical(mesh8):
    from tests.test_moma import _batch as moma_batch
    from tests.test_moma import _setup as moma_setup
    from moma_tpu.train.moma import make_moma_train_step

    cfg, state, step_plain = moma_setup(mesh8)
    cfg.run.remat = True
    from moma_tpu.data.augment import cifar_eval_normalize
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.models import create_model

    fs, _ = probe_shapes(create_model("resnet8", num_classes=10), 32, 16)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=32, s_dim=fs[-1][-1],
                     t_dim=fs[-1][-1])
    step_remat = make_moma_train_step(
        cfg, heads, augment_fn=lambda im, r: cifar_eval_normalize(im),
        donate=False, kl_train_bn_override=True)
    batch = moma_batch(mesh8)
    rng = jax.random.PRNGKey(4)
    _, m_plain = step_plain(state, batch, rng)
    _, m_remat = step_remat(state, batch, rng)
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isclose(float(m_plain[k]), float(m_remat[k]), rtol=1e-5), k
