"""Gradient accumulation (--grad_accum): microbatch-scan semantics.

The flag splits a batch into M equal microbatches scanned sequentially
with ONE optimizer update (train/steps.py, train/distill.py) — the
activation-memory lever.  Contract under test:

  * BN-free model: accumulated step == full-batch step exactly (the CE
    mean over equal microbatches equals the global mean).
  * BN model: accumulated step == the hand-built chain (microbatch 1 on
    the step's initial stats, microbatch 2 on microbatch 1's mutated
    stats, grads averaged) — the reference's per-GPU-BN world run
    sequentially.
  * Distill path: runs for stateless distillers; CRD's memory-bank extra
    chains through the scan (every sample's row written once per step).
  * MoMA path: rejected loudly (same-step contrast keys couple the
    microbatches through the queue; a silent semantic change would be
    worse than no feature — cf. VERDICT round 1 on silent knobs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.mesh import data_sharding, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.augment import cifar_eval_normalize
from moma_tpu.models import create_model
from moma_tpu.train.state import TrainState, make_sgd
from moma_tpu.train.steps import make_vanilla_train_step

B = 16
N_CLS = 10


def _state(model, mesh, wd=5e-4):
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
    )
    tx = make_sgd(lr_schedule(0.1, 4, 4, cosine=True), 0.9, wd)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return jax.device_put(state, replicated_sharding(mesh))


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


def _max_dev(a, b):
    """max |a-b| and max |a-b|/(|b|+1e-8) over the tree, for assertions."""
    d = jax.tree_util.tree_map(
        lambda x, y: (
            float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64)))),
            float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))
                         / (np.abs(np.asarray(y, np.float64)) + 1e-8))),
        ),
        a, b,
    )
    leaves = jax.tree_util.tree_leaves(d)
    return max(leaves[0::2]), max(leaves[1::2])


AUG = lambda im, rng: cifar_eval_normalize(im)  # deterministic


def test_vanilla_accum_exact_without_bn(mesh8):
    """Plain vgg8 (the registry's 'vgg8' is the BN variant, like the
    reference's model_dict — import the BN-free factory directly) has no
    batch coupling: accumulated grads == full-batch grads, so the updated
    params must match the plain step to float tolerance."""
    from moma_tpu.models.vgg import vgg8

    model = vgg8(num_classes=N_CLS)
    batch = _batch(mesh8)
    rng = jax.random.PRNGKey(3)

    s1, m1 = make_vanilla_train_step(AUG, donate=False)(
        _state(model, mesh8), batch, rng)
    s4, m4 = make_vanilla_train_step(AUG, donate=False, grad_accum=4)(
        _state(model, mesh8), batch, rng)

    assert np.isclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5), (
        float(m1["loss"]), float(m4["loss"]))
    assert np.isclose(float(m1["acc1"]), float(m4["acc1"]))
    abs_d, rel_d = _max_dev(s1.params, s4.params)
    assert abs_d < 1e-5 or rel_d < 1e-4, f"params diverged: abs {abs_d}, rel {rel_d}"


def test_vanilla_accum_matches_manual_bn_chain(mesh8):
    """resnet8 (BN): grad_accum=2 == hand-built two-microbatch chain."""
    model = create_model("resnet8", num_classes=N_CLS)
    state = _state(model, mesh8)
    batch = _batch(mesh8, seed=1)
    rng = jax.random.PRNGKey(5)

    s2, m2 = make_vanilla_train_step(AUG, donate=False, grad_accum=2)(
        state, batch, rng)

    # manual chain on replicated (host) values
    images = cifar_eval_normalize(batch["image"])
    labels = batch["label"]

    from moma_tpu.losses.functional import cross_entropy

    def loss_fn(params, bstats, im, lb):
        (feats, logits), mut = state.apply_fn(
            {"params": params, "batch_stats": bstats}, im,
            train=True, mutable=["batch_stats"],
        )
        return cross_entropy(logits, lb), mut["batch_stats"]

    g = jax.jit(jax.grad(loss_fn, has_aux=True), static_argnames=())
    g1, bs1 = g(state.params, state.batch_stats, images[: B // 2],
                labels[: B // 2])
    g2, bs2 = g(state.params, bs1, images[B // 2:], labels[B // 2:])
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    manual = state.apply_gradients(grads, new_batch_stats=bs2)

    # The manual chain and the scan differ only by sharding/reduction
    # order (float noise, ~2e-5 on params after one lr=0.1 step with BN
    # coupling); the SEMANTICALLY different full-batch step (BN over 16
    # rows instead of 8+8) must sit much farther away — that separation,
    # not an absolute epsilon, is what proves the scan implements the
    # chained-microbatch semantics.
    s1, _ = make_vanilla_train_step(AUG, donate=False)(state, batch, rng)
    abs_p, _ = _max_dev(s2.params, manual.params)
    abs_full, _ = _max_dev(s2.params, s1.params)
    assert abs_p < 1e-4, f"params vs manual chain: abs {abs_p}"
    assert abs_p < 0.05 * abs_full, (
        f"manual chain ({abs_p}) not decisively closer than the full-batch "
        f"step ({abs_full})")
    abs_b, _ = _max_dev(s2.batch_stats, manual.batch_stats)
    abs_bf, _ = _max_dev(s2.batch_stats, s1.batch_stats)
    assert abs_b < 1e-4 and abs_b < 0.05 * abs_bf, (abs_b, abs_bf)


def test_vanilla_accum_indivisible_batch_raises(mesh8):
    model = create_model("resnet8", num_classes=N_CLS)
    step = make_vanilla_train_step(AUG, donate=False, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        step(_state(model, mesh8), _batch(mesh8), jax.random.PRNGKey(0))


def test_distill_kd_accum_runs_and_moves(mesh8):
    from tests.test_distill import _batch as dbatch
    from tests.test_distill import _setup
    from moma_tpu.train.distill import make_distill_train_step

    cfg, distiller, state = _setup("kd", mesh8)
    step = make_distill_train_step(distiller, AUG, donate=False, grad_accum=2)
    new_state, metrics = step(state, dbatch(mesh8), jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.params["student"], new_state.params["student"],
        ),
    )
    assert moved > 0


def test_distill_crd_accum_chains_extra(mesh8):
    """CRD memory banks thread through the scan: every batch sample's
    bank row is written exactly once, and the lazy Z constant set by
    microbatch 1 is live for microbatch 2."""
    from tests.test_distill import _batch as dbatch
    from tests.test_distill import _setup
    from moma_tpu.train.distill import make_distill_train_step

    cfg, distiller, state = _setup("crd", mesh8)
    step = make_distill_train_step(distiller, AUG, donate=False, grad_accum=2)
    batch = dbatch(mesh8, with_crd=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    idx = np.asarray(batch["index"])
    assert np.abs(
        np.asarray(state.extra.v1)[idx] - np.asarray(new_state.extra.v1)[idx]
    ).sum() > 0, "bank rows for ALL microbatches must be written"
    assert float(new_state.extra.z_v1) > 0


def test_moma_grad_accum_invalid_combos_raise(mesh8):
    """MoMA grad_accum is supported (tests/test_moma_grad_accum.py), but
    the combos that would nest or contradict rank semantics must error."""
    from moma_tpu.core.config import Config, DistillConfig, MomaConfig
    from moma_tpu.train.moma import make_moma_train_step

    def cfg_with(**run):
        cfg = Config()
        cfg.distill = DistillConfig(distill="moma")
        cfg.moma = MomaConfig()
        cfg.run.grad_accum = 2
        for k, v in run.items():
            setattr(cfg.run if k == "bn" else cfg.moma, k, v)
        return cfg

    with pytest.raises(ValueError, match="bn"):
        make_moma_train_step(cfg_with(bn="local"), heads=None,
                             augment_fn=None, mesh=mesh8,
                             kl_train_bn_override=True)
    with pytest.raises(ValueError, match="fast_teacher"):
        make_moma_train_step(cfg_with(fast_teacher=True), heads=None,
                             augment_fn=None, kl_train_bn_override=True)


def test_cli_bridge_parses_grad_accum():
    from moma_tpu.core.config import parse_teacher_args

    cfg = parse_teacher_args(["--model", "resnet8", "--grad_accum", "4"])
    assert cfg.run.grad_accum == 4
