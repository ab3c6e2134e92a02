"""End-to-end distillation step smoke for every method in the zoo, on the
8-device CPU mesh: one step runs, loss is finite, aux params get
gradients (where they should)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.config import Config, DistillConfig, MomaConfig
from moma_tpu.core.mesh import data_sharding, replicated_sharding
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.augment import cifar_eval_normalize
from moma_tpu.data.sampler import InstanceSampler
from moma_tpu.models import create_model
from moma_tpu.train.distill import Distiller, make_distill_train_step, probe_shapes
from moma_tpu.train.state import DistillState, make_sgd

METHODS = [
    "kd", "hint", "attention", "similarity", "vid", "crd", "semckd",
    "srrl", "simkd", "nst", "rkd", "pkt", "correlation", "ab", "fsp", "ft",
]

B = 16
N_CLS = 10
N_DATA = 64


def _setup(method, mesh):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill=method, cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=32, nce_k=8, nce_t=0.07, nce_m=0.5)
    cfg.model_s.n_cls = N_CLS

    student = create_model("resnet8", num_classes=N_CLS)
    teacher = create_model("resnet14", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    sample = jnp.zeros((2, 32, 32, 3))
    vars_s = student.init(k1, sample, train=False)
    vars_t = teacher.init(k2, sample, train=False)
    fs, _ = probe_shapes(student, 32, B)
    ft, _ = probe_shapes(teacher, 32, B)
    distiller = Distiller(cfg, fs, ft, n_data=N_DATA, batch_size=B)
    aux_params, aux_bs = distiller.init_aux(k3)
    extra = distiller.init_extra(k4)

    tx = make_sgd(lr_schedule(0.05, 5, 4, cosine=True), 0.9, 5e-4)
    params = {"student": vars_s["params"], "aux": aux_params}
    state = DistillState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"student": vars_s["batch_stats"], "aux": aux_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t["batch_stats"],
        opt_state=tx.init(params),
        extra=extra,
        tx=tx,
        apply_fn=student.apply,
        teacher_apply_fn=teacher.apply,
    )
    return cfg, distiller, jax.device_put(state, replicated_sharding(mesh))


def _batch(mesh, with_crd=False, seed=0):
    rs = np.random.RandomState(seed)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (B, 32, 32, 3), dtype=np.uint8),
            data_sharding(mesh),
        ),
        "label": jax.device_put(
            rs.randint(0, N_CLS, (B,)).astype(np.int32),
            data_sharding(mesh, ndim=1),
        ),
    }
    if with_crd:
        labels = rs.randint(0, N_CLS, (N_DATA,))
        sampler = InstanceSampler(labels, k=8, mode="exact")
        idx = rs.choice(N_DATA, B, replace=False)
        batch["index"] = jax.device_put(
            idx.astype(np.int32), data_sharding(mesh, ndim=1)
        )
        batch["contrast_idx"] = jax.device_put(
            sampler.sample(idx).astype(np.int32), data_sharding(mesh, ndim=2)
        )
    return batch


@pytest.mark.parametrize("method", METHODS)
def test_distill_step_runs(method, mesh8):
    cfg, distiller, state = _setup(method, mesh8)
    step = make_distill_train_step(
        distiller, augment_fn=lambda im, r: cifar_eval_normalize(im), donate=False
    )
    batch = _batch(mesh8, with_crd=(method == "crd"))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_cls", "loss_div", "loss_kd"):
        assert np.isfinite(float(metrics[k])), (method, k, metrics[k])
    assert int(new_state.step) == 1

    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.params["student"],
            new_state.params["student"],
        ),
    )
    assert diff > 0

    if method == "crd":
        # CRD memory rows at batch indices must have been updated
        idx = np.asarray(batch["index"])
        before = np.asarray(state.extra.v1)[idx]
        after = np.asarray(new_state.extra.v1)[idx]
        assert np.abs(before - after).sum() > 0
        assert float(new_state.extra.z_v1) > 0  # lazy Z set on first batch


def test_two_steps_crd_z_constant(mesh8):
    """Z is set on the first batch and then held (crd/memory.py:53-63)."""
    cfg, distiller, state = _setup("crd", mesh8)
    step = make_distill_train_step(
        distiller, augment_fn=lambda im, r: cifar_eval_normalize(im), donate=False
    )
    s1, _ = step(state, _batch(mesh8, with_crd=True, seed=0), jax.random.PRNGKey(1))
    z_after_1 = float(s1.extra.z_v1)
    s2, _ = step(s1, _batch(mesh8, with_crd=True, seed=1), jax.random.PRNGKey(2))
    assert float(s2.extra.z_v1) == pytest.approx(z_after_1)
