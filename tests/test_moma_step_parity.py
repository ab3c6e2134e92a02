"""FULL MoMA training-step parity vs the reference implementation.

Runs ONE complete reference step on CPU — the actual reference modules
(MoMA/mem_moco.MoCo, MoMA/criterion_moco_att.CMO, learning/
contrast_trainer.ContrastTrainer: momentum_update + _shuffle_bn under a
1-rank gloo process group) wired exactly as helper/loops_moma.py:244-361
— and compares against our single jitted step with identical weights,
memory and batch:

  * loss_cls / loss_div / loss_kd / total
  * student + embed_s + atts_q gradients (atts_k / atts_queue must be
    zero: the reference detaches k inside MoCo.forward, mem_moco.py:86)
  * post-step queue memory rows and pointer
  * EMA-updated teacher parameters

The shuffle permutation is pinned to identity on both sides (the
reference draws it via torch.randperm + broadcast; set-wise the keys are
identical under any permutation, identity makes it elementwise).
"""

import copy
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "MoMA")),
    reason="reference tree not available",
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

# learning/base_trainer.py imports tensorboard_logger at module scope; stub
# it (not installed here, and unused by the pieces we exercise)
sys.modules.setdefault("tensorboard_logger", types.ModuleType("tensorboard_logger"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, HW, N_CLS = 8, 32, 10
S_DIM = 64          # resnet8 pooled dim
FEAT = 32           # projection dim (divisible by 4 heads)
K, T_NCE = 64, 0.15
ALPHA = 0.999
C_CLS, C_DIV, C_BETA = 1.0, 1.0, 1.0
KD_T = 4.0
LR = 0.1


@pytest.fixture(scope="module")
def patched_torch():
    """Module-scoped .cuda() neutralization + identity randperm (explicitly
    restored — torch.randperm must not leak into other test files)."""
    mp = pytest.MonkeyPatch()
    mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
    mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self,
               raising=False)
    mp.setattr(torch, "randperm", lambda n, **kw: torch.arange(n),
               raising=False)
    yield
    mp.undo()


@pytest.fixture(scope="module")
def gloo_group():
    import torch.distributed as dist

    if dist.is_initialized():
        yield
        return
    try:
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29517", rank=0, world_size=1
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"gloo unavailable: {e}")
    yield
    dist.destroy_process_group()


def _opt_shim():
    return types.SimpleNamespace(
        s_dim=S_DIM, t_dim=S_DIM, feat_dim=FEAT, head="mlp", attn="self",
        nce_k=K, nce_t=T_NCE, nce_m=0.5, n_data=100,
        local_rank=0, node_rank=0, ngpus_per_node=1, mem="MoCo",
    )


def _reference_step(images_np, labels_np, memory_np):
    """One reference 'moma' step; returns everything we compare."""
    import torch.nn as nn
    from distiller_zoo import DistillKL
    from learning.contrast_trainer import ContrastTrainer
    from MoMA.criterion_moco_att import CMO
    from MoMA.mem_moco import MoCo
    from models.resnet import resnet8

    torch.manual_seed(0)
    model_s = resnet8(num_classes=N_CLS)
    model_t = resnet8(num_classes=N_CLS)
    cmo = CMO(_opt_shim())
    mem = MoCo(FEAT, K=K, T=T_NCE)
    with torch.no_grad():
        mem.memory.copy_(torch.from_numpy(memory_np))

    snap = {
        "model_s": copy.deepcopy(model_s.state_dict()),
        "model_t": copy.deepcopy(model_t.state_dict()),
        "cmo": copy.deepcopy(cmo.state_dict()),
    }

    images = torch.from_numpy(images_np)
    labels = torch.from_numpy(labels_np)
    model_s.train()
    model_t.eval()
    cmo.train()

    # loops_moma.py:268-279
    feat_s, logit_s = model_s(images, is_feat=True)
    with torch.no_grad():
        feat_t, logit_t = model_t(images, is_feat=True)
    loss_cls = nn.CrossEntropyLoss()(logit_s, labels)
    loss_div = DistillKL(KD_T)(logit_s, logit_t)

    # loops_moma.py:309-320 — EMA before keys, teacher BN to train mode
    trainer = ContrastTrainer.__new__(ContrastTrainer)
    trainer.args = _opt_shim()
    trainer.local_group = None
    trainer.momentum_update(model_s, model_t, ALPHA)
    cmo.embed_t.eval()
    trainer.momentum_update(cmo.embed_s, cmo.embed_t, ALPHA)
    for m in model_t.modules():
        if "BatchNorm" in m.__class__.__name__:
            m.train()
    k, all_k = trainer._shuffle_bn(images, model_t, model_ema_head=cmo.embed_t)

    # loops_moma.py:323-335
    f_s = cmo.embed_s(feat_s[-1])
    f_s = cmo.atts_q(f_s)
    k = cmo.atts_k(k)
    all_k = cmo.atts_queue(all_k)
    logits, target = mem(q=f_s, k=k, all_k=all_k)
    loss_kd = nn.CrossEntropyLoss()(logits, target)

    total = C_CLS * loss_cls + C_DIV * loss_div + C_BETA * loss_kd
    total.backward()

    def grad_dict(module, params_snap):
        out = {}
        grads = {n: p.grad for n, p in module.named_parameters()}
        for name, tensor in module.state_dict().items():
            if name in grads and grads[name] is not None:
                out[name] = grads[name].numpy().copy()
            else:
                out[name] = np.zeros_like(tensor.numpy())
        return out

    return {
        "snap": snap,
        "losses": tuple(
            float(x.detach()) for x in (loss_cls, loss_div, loss_kd, total)
        ),
        "grads_s": grad_dict(model_s, snap["model_s"]),
        "grads_cmo": grad_dict(cmo, snap["cmo"]),
        "atts_k_has_grad": any(
            p.grad is not None and p.grad.abs().sum() > 0
            for n, p in cmo.named_parameters() if n.startswith("atts_k")
        ),
        "post_memory": mem.memory.numpy().copy(),
        "post_ptr": int(mem.index),
        "post_teacher": {k2: v.numpy().copy()
                         for k2, v in model_t.state_dict().items()},
    }


def _build_ours(ref, images_np, labels_np, memory_np):
    from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig
    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.models import create_model
    from moma_tpu.models.torch_import import convert_state_dict
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.moma.queue import QueueState
    from moma_tpu.train.moma import make_moma_train_step
    from moma_tpu.train.state import MomaState, make_sgd

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = B
    cfg.distill = DistillConfig(distill="moma", cls=C_CLS, div=C_DIV,
                                beta=C_BETA, kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          shuffle_bn=False,
                          # this harness pins STEP 1, where the reference's
                          # teacher is still in eval mode (pre-flight
                          # validation set it); steady-state train-mode KL
                          # is pinned by the multi-step test below
                          kl_teacher_bn="eval")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    mesh = create_mesh()
    model = create_model("resnet8", num_classes=N_CLS)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.fold_in(rng, 0), sample, train=False)
    vars_t = model.init(jax.random.fold_in(rng, 1), sample, train=False)

    def to_np(sd):
        return {k: v.numpy() for k, v in sd.items()}

    conv_s = convert_state_dict(to_np(ref["snap"]["model_s"]), vars_s)
    conv_t = convert_state_dict(to_np(ref["snap"]["model_t"]), vars_t)

    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM)
    cmo_params, cmo_bs = heads.init(jax.random.fold_in(rng, 2))
    conv_cmo = convert_state_dict(
        to_np(ref["snap"]["cmo"]), {"params": cmo_params}
    )["params"]

    queue = QueueState(
        memory={"memory": jnp.asarray(memory_np)},
        ptr=jnp.zeros((), jnp.int32),
    )
    tx = make_sgd(LR, momentum=0.0, weight_decay=0.0)
    params = {"student": conv_s["params"], "cmo": conv_cmo}
    state = MomaState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={"student": conv_s["batch_stats"], "cmo": cmo_bs},
        teacher_params=conv_t["params"],
        teacher_batch_stats=conv_t["batch_stats"],
        queue=queue, opt_state=tx.init(params), tx=tx,
        apply_fn=model.apply, teacher_apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_moma_train_step(cfg, heads, augment_fn=None, donate=False)
    batch = {
        "image": jax.device_put(
            np.transpose(images_np, (0, 2, 3, 1)), data_sharding(mesh)
        ),
        "label": jax.device_put(labels_np, data_sharding(mesh, ndim=1)),
    }
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
    # conv_s/conv_t/conv_cmo keep the converter's call-order key layout
    # (device_put sorts pytree dict keys, desyncing the module streams)
    return state, new_state, metrics, conv_s, conv_t, conv_cmo


@pytest.fixture(scope="module")
def parity(gloo_group, patched_torch):
    rs = np.random.RandomState(3)
    images_np = rs.rand(B, 3, HW, HW).astype(np.float32)
    labels_np = rs.randint(0, N_CLS, (B,)).astype(np.int64)
    memory_np = rs.randn(K, FEAT).astype(np.float32)
    memory_np /= np.linalg.norm(memory_np, axis=1, keepdims=True)

    ref = _reference_step(images_np, labels_np, memory_np)
    ours = _build_ours(ref, images_np, labels_np,
                       memory_np, )
    return ref, ours, labels_np.astype(np.int32)


def test_losses_match(parity):
    ref, (state, new_state, metrics, _, _, _), _ = parity
    cls_r, div_r, kd_r, tot_r = ref["losses"]
    np.testing.assert_allclose(float(metrics["loss_cls"]), cls_r, rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_div"]), div_r, rtol=2e-3,
                               atol=1e-6)
    np.testing.assert_allclose(float(metrics["loss_kd"]), kd_r, rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss"]), tot_r, rtol=2e-4)


def test_queue_state_matches(parity):
    ref, (state, new_state, metrics, _, _, _), _ = parity
    assert int(new_state.queue.ptr) == ref["post_ptr"] == B
    np.testing.assert_allclose(
        np.asarray(new_state.queue.memory["memory"]),
        ref["post_memory"], rtol=1e-4, atol=2e-5,
    )


def test_ema_teacher_matches(parity):
    ref, (state, new_state, metrics, conv_s, conv_t, conv_cmo), _ = parity
    from moma_tpu.models.torch_import import convert_state_dict

    conv_post = convert_state_dict(
        ref["post_teacher"],
        {"params": conv_t["params"], "batch_stats": conv_t["batch_stats"]},
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(conv_post["params"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, new_state.teacher_params)
    ))
    assert flat_ref
    for path, want in flat_ref:
        got = flat_new[path]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                   err_msg=str(path))


def test_student_and_head_grads_match(parity):
    ref, (state, new_state, metrics, conv_s, conv_t, conv_cmo), _ = parity
    from moma_tpu.models.torch_import import convert_state_dict

    # ours: grad = (old - new) / LR  (plain SGD, no momentum/decay)
    def derived_grads(old, new):
        return jax.tree_util.tree_map(
            lambda o, n: (np.asarray(o, np.float32) - np.asarray(n, np.float32)) / LR,
            old, new,
        )

    g_student = derived_grads(state.params["student"],
                              new_state.params["student"])
    # reference grads converted through the SAME layout mapping as weights
    ref_g = convert_state_dict(
        ref["grads_s"],
        {"params": conv_s["params"], "batch_stats": conv_s["batch_stats"]},
    )["params"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_student))
    assert len(flat_ref) > 10
    for path, want in flat_ref:
        got = flat_got[path]
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=2e-5, err_msg=str(path)
        )

    # CMO: embed_s + atts_q carry signal; atts_k/atts_queue must be ZERO
    # (reference detaches k inside MoCo.forward, mem_moco.py:86)
    assert not ref["atts_k_has_grad"]
    g_cmo = derived_grads(state.params["cmo"], new_state.params["cmo"])
    # NOTE: pass the ORDER-PRESERVING params dict — tree_map would sort keys
    # and desynchronize the converter's module streams
    ref_gc = convert_state_dict(
        ref["grads_cmo"], {"params": conv_cmo}
    )["params"]
    for name in ("embed_s", "atts_q"):
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_gc[name])
        flat_got = dict(jax.tree_util.tree_leaves_with_path(g_cmo[name]))
        for path, want in flat_ref:
            np.testing.assert_allclose(
                flat_got[path], want, rtol=5e-3, atol=2e-5,
                err_msg=f"{name}{path}",
            )
    for name in ("atts_k", "atts_queue"):
        for leaf in jax.tree_util.tree_leaves(g_cmo[name]):
            np.testing.assert_allclose(leaf, 0.0, atol=1e-7)
