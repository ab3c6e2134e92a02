"""MoMA gradient accumulation: microbatch == virtual DDP rank.

The oracle is the bn='local' shard_map path (itself pinned against a
REAL 2-rank gloo reference run in tests/test_moma_local_bn.py): running
grad_accum=M on ONE device must reproduce the M-device bn='local' step
on the same batch — same per-rank BN statistics, same Shuffle-BN
permutation semantics, same per-rank augment rng (fold_in(k_aug, i) ==
fold_in(k_aug, axis_index)), gradients/metrics averaged like DDP's
all-reduce, one queue advance by the global batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

B, HW, N_CLS = 8, 16, 6
S_DIM = 64
FEAT = 32
K, T_NCE = 64, 0.15
ALPHA = 0.999
LR = 0.1
M = 2
PERM = np.array([5, 2, 7, 0, 3, 6, 1, 4], dtype=np.int32)


def _noise_augment(images, key):
    # rng-sensitive stand-in for the real augment stage: parity fails if
    # the accum path folds a different per-rank stream than shard_map
    return images + 0.05 * jax.random.normal(key, images.shape,
                                             images.dtype)


def _cfg(mem: str, bn: str, grad_accum: int = 1):
    from moma_tpu.core.config import (Config, DistillConfig, ModelConfig,
                                      MomaConfig)

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=4.0)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem=mem, head="mlp", attn="self",
                          shuffle_bn=True, kl_teacher_bn="train")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.run.bn = bn
    cfg.run.grad_accum = grad_accum
    return cfg


def _build_state(mem: str, mesh=None):
    from moma_tpu.core.mesh import replicated_sharding
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.state import MomaState, make_sgd

    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 1), sample, train=False)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM)
    cmo_params, cmo_bs = heads.init(jax.random.fold_in(rng, 2))
    names = ("memory_s", "memory_t") if mem in ("MoCoST", "MoCoSSTT") \
        else ("memory",)
    queue = QueueState.create(jax.random.fold_in(rng, 3), K, FEAT,
                              names=names)
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
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
    return state, heads


def _batch(mesh=None):
    from moma_tpu.core.mesh import data_sharding

    rs = np.random.RandomState(3)
    images = rs.rand(B, HW, HW, 3).astype(np.float32)
    labels = rs.randint(0, N_CLS, (B,)).astype(np.int32)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels),
             "shuffle_perm": jnp.asarray(PERM)}
    if mesh is not None:
        batch = {
            "image": jax.device_put(images, data_sharding(mesh)),
            "label": jax.device_put(labels, data_sharding(mesh, ndim=1)),
            "shuffle_perm": jax.device_put(PERM),
        }
    return batch


def _run(mem: str, path: str, augment):
    """path: 'accum' = grad_accum=M single jit; 'local' = bn='local'
    shard_map over an M-device mesh slice."""
    from moma_tpu.core.mesh import create_mesh
    from moma_tpu.train.moma import make_moma_train_step

    if path == "local":
        mesh = create_mesh(jax.devices()[:M])
        state, heads = _build_state(mem, mesh)
        cfg = _cfg(mem, "local")
        step = make_moma_train_step(cfg, heads, augment_fn=augment,
                                    donate=False, mesh=mesh)
        batch = _batch(mesh)
    else:
        state, heads = _build_state(mem)
        cfg = _cfg(mem, "global", grad_accum=M)
        step = make_moma_train_step(cfg, heads, augment_fn=augment,
                                    donate=False)
        batch = _batch()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    return state, new_state, metrics


def _tree_close(got, want, rtol, atol, tag):
    flat_want = jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, want))
    flat_got = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, got)))
    assert flat_want
    for path, w in flat_want:
        np.testing.assert_allclose(flat_got[path], w, rtol=rtol, atol=atol,
                                   err_msg=f"{tag}{path}")


@pytest.mark.parametrize("mem,augment", [
    ("MoCo", None),
    ("MoCo", _noise_augment),
    ("MoCoSSTT", _noise_augment),
])
def test_accum_matches_local_bn_shard_map(mem, augment):
    """grad_accum=M == the M-device bn='local' shard_map step: metrics,
    updated params (student + CMO), queue memory/pointer, EMA teacher
    params and the averaged per-rank BN running statistics."""
    s0a, sa, ma = _run(mem, "accum", augment)
    s0l, sl, ml = _run(mem, "local", augment)

    for k in ("loss", "loss_cls", "loss_div", "loss_kd", "acc1"):
        np.testing.assert_allclose(float(ma[k]), float(ml[k]), rtol=2e-5,
                                   atol=1e-6, err_msg=k)
    assert int(ma["queue_ptr"]) == int(ml["queue_ptr"]) == B

    _tree_close(sa.params, sl.params, rtol=2e-4, atol=1e-6, tag="params")
    _tree_close(sa.teacher_params, sl.teacher_params, rtol=1e-5, atol=1e-7,
                tag="teacher")
    _tree_close(sa.teacher_batch_stats, sl.teacher_batch_stats,
                rtol=2e-4, atol=1e-6, tag="teacher_bs")
    _tree_close(sa.batch_stats, sl.batch_stats, rtol=2e-4, atol=1e-6,
                tag="bs")
    for name in sa.queue.memory:
        np.testing.assert_allclose(
            np.asarray(sa.queue.memory[name]),
            np.asarray(sl.queue.memory[name]),
            rtol=1e-4, atol=1e-5, err_msg=f"queue:{name}")


def test_accum_indivisible_batch_raises():
    from moma_tpu.train.moma import make_moma_train_step

    state, heads = _build_state("MoCo")
    cfg = _cfg("MoCo", "global", grad_accum=3)
    step = make_moma_train_step(cfg, heads, augment_fn=None, donate=False)
    with pytest.raises(ValueError, match="divisible"):
        step(state, _batch(), jax.random.PRNGKey(0))


def test_accum_composes_with_remat():
    """--remat inside the accum scan: numerics identical by construction."""
    from moma_tpu.train.moma import make_moma_train_step

    outs = []
    for remat in (False, True):
        state, heads = _build_state("MoCo")
        cfg = _cfg("MoCo", "global", grad_accum=M)
        cfg.run.remat = remat
        step = make_moma_train_step(cfg, heads, augment_fn=None,
                                    donate=False)
        new_state, metrics = step(state, _batch(), jax.random.PRNGKey(7))
        outs.append((new_state, metrics))
    (sa, ma), (sb, mb) = outs
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    _tree_close(sa.params, sb.params, rtol=1e-6, atol=1e-7, tag="params")
