"""End-to-end vanilla training smoke on the 8-device CPU mesh: loss goes
down, metrics/eval plumbing works, state stays replicated while the batch
is sharded (the capability the reference gets from DDP + DistributedSampler,
train_teacher.py:190-248)."""

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
from moma_tpu.core.metrics import EvalAccumulator
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.augment import cifar_eval_normalize, cifar_train_augment
from moma_tpu.data.pipeline import Loader, synthetic_dataset
from moma_tpu.models import create_model
from moma_tpu.train.state import TrainState, make_sgd
from moma_tpu.train.steps import make_eval_step, make_vanilla_train_step


def _build_state(model, mesh, lr=0.1, steps_per_epoch=4):
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    tx = make_sgd(
        lr_schedule(lr, 12, steps_per_epoch, cosine=True),
        momentum=0.9,
        weight_decay=5e-4,
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    return jax.device_put(state, replicated_sharding(mesh))


def test_vanilla_train_loss_decreases(mesh8):
    n_cls = 10
    model = create_model("resnet8", num_classes=n_cls)
    state = _build_state(model, mesh8)
    ds = synthetic_dataset(64, 32, n_cls, seed=1)
    loader = Loader(ds, batch_size=16, train=True, seed=0)
    # deterministic normalize-only "augmentation" so the net can memorize
    step_fn = make_vanilla_train_step(
        augment_fn=lambda img, rng: cifar_eval_normalize(img), donate=False
    )

    shard = data_sharding(mesh8)
    lshard = data_sharding(mesh8, ndim=1)
    losses = []
    for epoch in range(12):
        loader.set_epoch(epoch)
        for i, batch in enumerate(loader):
            b = {
                "image": jax.device_put(batch["image"], shard),
                "label": jax.device_put(batch["label"], lshard),
            }
            rng = jax.random.fold_in(jax.random.PRNGKey(7), epoch * 100 + i)
            state, metrics = step_fn(state, b, rng)
            losses.append(float(metrics["loss"]))
    # memorizing 64 synthetic images: loss must collapse
    assert losses[-1] < 1.0, (losses[0], losses[-1])


def test_eval_step_conf_mat_and_padding(mesh8):
    n_cls = 5
    model = create_model("resnet8", num_classes=n_cls)
    state = _build_state(model, mesh8)
    ds = synthetic_dataset(36, 32, n_cls, seed=2)  # 36 % 16 != 0 -> ragged tail
    loader = Loader(ds, batch_size=16, train=False)
    eval_step = make_eval_step(model.apply, n_cls, normalize_fn=cifar_eval_normalize)

    acc = EvalAccumulator(n_cls=n_cls)
    shard = data_sharding(mesh8)
    lshard = data_sharding(mesh8, ndim=1)
    for batch in loader:
        b = {
            "image": jax.device_put(batch["image"], shard),
            "label": jax.device_put(batch["label"], lshard),
            "mask": jax.device_put(batch["mask"], lshard),
        }
        loss_sum, n, cm = eval_step(state.params, state.batch_stats, b)
        acc.update(float(loss_sum), float(n), np.asarray(cm))
    assert acc.n == 36
    assert acc.conf_mat.sum() == 36
    assert 0.0 <= acc.acc <= 100.0
    assert 0.0 <= acc.f1 <= 1.0


def test_grad_sync_equals_global_batch():
    """Data-sharded gradient == single-device gradient on the same global
    batch (the invariant DDP provides in the reference)."""
    mesh1 = create_mesh(jax.devices()[:1])
    mesh8 = create_mesh()
    model = create_model("resnet8", num_classes=4)
    ds = synthetic_dataset(16, 32, 4, seed=3)
    batch_np = {
        "image": ds.images,
        "label": ds.labels,
    }
    step_fn = make_vanilla_train_step(augment_fn=None, donate=False)
    rng = jax.random.PRNGKey(0)

    results = []
    for mesh in (mesh1, mesh8):
        state = _build_state(model, mesh)
        b = {
            "image": jax.device_put(
                cifar_eval_normalize(jnp.asarray(batch_np["image"])),
                data_sharding(mesh),
            ),
            "label": jax.device_put(batch_np["label"], data_sharding(mesh, ndim=1)),
        }
        new_state, metrics = step_fn(state, b, rng)
        results.append((float(metrics["loss"]), new_state.params))

    loss1, p1 = results[0]
    loss8, p8 = results[1]
    assert loss1 == jax.numpy.asarray(loss8).item() or abs(loss1 - loss8) < 1e-5
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b_ in zip(flat1, flat8):
        # cross-device reductions reorder float sums; tolerance reflects that
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4
        )


def test_epoch_meters_cover_every_batch(mesh8):
    """train_one_epoch's epoch statistics average EVERY step (device-side
    lazy accumulation, one fetch) — not just the print_freq samples the
    reference-style meters see (helper/loops_moma.py:44-46)."""
    from moma_tpu.train.loop import train_one_epoch

    n_cls = 10
    model = create_model("resnet8", num_classes=n_cls)
    state = _build_state(model, mesh8)
    ds = synthetic_dataset(64, 32, n_cls, seed=1)
    loader = Loader(ds, batch_size=16, train=True, seed=0)
    step_fn = make_vanilla_train_step(
        augment_fn=lambda img, rng: cifar_eval_normalize(img), donate=False
    )

    # ground truth: replay the identical epoch step-by-step
    state_ref = _build_state(model, mesh8)
    rng0 = jax.random.PRNGKey(3)
    loader.set_epoch(1)
    shard = data_sharding(mesh8)
    lshard = data_sharding(mesh8, ndim=1)
    ref_losses, ref_accs = [], []
    for i, batch in enumerate(loader):
        b = {
            "image": jax.device_put(batch["image"], shard),
            "label": jax.device_put(batch["label"], lshard),
        }
        rng = jax.random.fold_in(rng0, 1 * 1_000_003 + i)
        state_ref, m = step_fn(state_ref, b, rng)
        ref_losses.append(float(m["loss"]))
        ref_accs.append(float(m["acc1"]))

    # print_freq larger than the epoch: the old subsampled meters would
    # have seen only the final batch
    state2 = _build_state(model, mesh8)
    _, tr = train_one_epoch(
        state2, loader, step_fn, mesh8, epoch=1, base_rng=rng0,
        print_freq=1000,
    )
    np.testing.assert_allclose(tr["loss"], np.mean(ref_losses), rtol=1e-5)
    np.testing.assert_allclose(tr["acc1"], np.mean(ref_accs), rtol=1e-5)
