"""MULTI-STEP MoMA loss-curve parity vs the reference (12 chained steps).

The single-step harness (test_moma_step_parity) pins step 1, where the
reference's teacher is still in eval mode.  This pins the STEADY STATE:
model_t starts in train mode (as it is from step 2 on in the reference —
set_bn_train persists), so every KL forward uses batch statistics and
mutates running stats BEFORE the key forward; the EMA compounds over
steps; and with K=64, B=8 the queue pointer WRAPS at step 8, exercising
the circular write against live optimizer updates.

SGD is momentum-0/wd-0 to isolate the MoMA state machine (optimizer
interplay is pinned separately by test_vanilla_step_parity).
"""

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
sys.modules.setdefault("tensorboard_logger", types.ModuleType("tensorboard_logger"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, HW, N_CLS = 8, 32, 10
S_DIM, FEAT = 64, 32
K, T_NCE = 64, 0.15
ALPHA = 0.9       # faster EMA so drift differences would show quickly
LR = 0.05
KD_T = 4.0
N_STEPS = 12      # queue (K=64) wraps at step 8


@pytest.fixture(scope="module")
def patched_torch():
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
            "gloo", init_method="tcp://127.0.0.1:29519", rank=0, world_size=1
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"gloo unavailable: {e}")
    yield
    dist.destroy_process_group()


def test_twelve_step_loss_curve_parity(gloo_group, patched_torch):
    import copy

    import torch.nn as nn
    from distiller_zoo import DistillKL
    from learning.contrast_trainer import ContrastTrainer
    from MoMA.criterion_moco_att import CMO
    from MoMA.mem_moco import MoCo
    from models.resnet import resnet8

    rs = np.random.RandomState(21)
    batches = [(rs.rand(B, 3, HW, HW).astype(np.float32),
                rs.randint(0, N_CLS, (B,)).astype(np.int64))
               for _ in range(N_STEPS)]
    memory_np = rs.randn(K, FEAT).astype(np.float32)
    memory_np /= np.linalg.norm(memory_np, axis=1, keepdims=True)

    # ---------------- reference: 12 real steps with a live optimizer
    opt_shim = types.SimpleNamespace(
        s_dim=S_DIM, t_dim=S_DIM, feat_dim=FEAT, head="mlp", attn="self",
        local_rank=0, node_rank=0, ngpus_per_node=1, mem="MoCo",
    )
    torch.manual_seed(3)
    model_s = resnet8(num_classes=N_CLS)
    model_t = resnet8(num_classes=N_CLS)
    cmo = CMO(opt_shim)
    mem = MoCo(FEAT, K=K, T=T_NCE)
    with torch.no_grad():
        mem.memory.copy_(torch.from_numpy(memory_np))
    snap = {
        "model_s": copy.deepcopy(model_s.state_dict()),
        "model_t": copy.deepcopy(model_t.state_dict()),
        "cmo": copy.deepcopy(cmo.state_dict()),
    }
    trainer = ContrastTrainer.__new__(ContrastTrainer)
    trainer.args = opt_shim
    trainer.local_group = None
    trainable = (list(model_s.parameters()) + list(cmo.embed_s.parameters())
                 + list(cmo.atts_q.parameters()) + list(cmo.atts_k.parameters())
                 + list(cmo.atts_queue.parameters()))
    opt = torch.optim.SGD(trainable, lr=LR, momentum=0.0, weight_decay=0.0)

    model_s.train()
    model_t.train()  # steady state: BN train mode from the first step
    cmo.train()
    ce = nn.CrossEntropyLoss()
    kl = DistillKL(KD_T)
    ref_curve = []
    for images_np, labels_np in batches:
        images = torch.from_numpy(images_np)
        labels = torch.from_numpy(labels_np)
        feat_s, logit_s = model_s(images, is_feat=True)
        with torch.no_grad():
            _, logit_t = model_t(images, is_feat=True)
        loss_cls = ce(logit_s, labels)
        loss_div = kl(logit_s, logit_t)
        trainer.momentum_update(model_s, model_t, ALPHA)
        cmo.embed_t.eval()
        trainer.momentum_update(cmo.embed_s, cmo.embed_t, ALPHA)
        k_, all_k = trainer._shuffle_bn(images, model_t,
                                        model_ema_head=cmo.embed_t)
        f_s = cmo.atts_q(cmo.embed_s(feat_s[-1]))
        k_ = cmo.atts_k(k_)
        all_k = cmo.atts_queue(all_k)
        logits, target = mem(q=f_s, k=k_, all_k=all_k)
        loss_kd = ce(logits, target)
        total = loss_cls + loss_div + loss_kd
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_curve.append(
            (float(loss_cls.detach()), float(loss_div.detach()),
             float(loss_kd.detach()))
        )

    # ---------------- ours: 12 jitted steps
    from moma_tpu.core.config import (
        Config,
        DistillConfig,
        ModelConfig,
        MomaConfig,
    )
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
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0,
                                kd_T=KD_T)
    cfg.moma = MomaConfig(feat_dim=FEAT, nce_k=K, nce_t=T_NCE, alpha=ALPHA,
                          mem="MoCo", head="mlp", attn="self",
                          shuffle_bn=False, kl_teacher_bn="train")
    cfg.model_s = ModelConfig(name="resnet8", n_cls=N_CLS)
    cfg.model_t = ModelConfig(name="resnet8", n_cls=N_CLS)

    mesh = create_mesh()
    model = create_model("resnet8", num_classes=N_CLS)
    sample = jnp.zeros((2, HW, HW, 3))
    vars_s = model.init(jax.random.PRNGKey(0), sample, train=False)
    vars_t = model.init(jax.random.PRNGKey(1), sample, train=False)

    def to_np(sd):
        return {kk: vv.numpy() for kk, vv in sd.items()}

    conv_s = convert_state_dict(to_np(snap["model_s"]), vars_s)
    conv_t = convert_state_dict(to_np(snap["model_t"]), vars_t)
    heads = CMOHeads(head="mlp", attn="self", feat_dim=FEAT, s_dim=S_DIM,
                     t_dim=S_DIM)
    cmo_params0, cmo_bs = heads.init(jax.random.PRNGKey(2))
    conv_cmo = convert_state_dict(
        to_np(snap["cmo"]), {"params": cmo_params0}
    )["params"]
    queue = QueueState(memory={"memory": jnp.asarray(memory_np)},
                       ptr=jnp.zeros((), jnp.int32))
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

    got_curve = []
    for i, (images_np, labels_np) in enumerate(batches):
        batch = {
            "image": jax.device_put(np.transpose(images_np, (0, 2, 3, 1)),
                                    data_sharding(mesh)),
            "label": jax.device_put(labels_np.astype(np.int32),
                                    data_sharding(mesh, ndim=1)),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        got_curve.append((float(metrics["loss_cls"]),
                          float(metrics["loss_div"]),
                          float(metrics["loss_kd"])))

    # per-step losses track with drift-tolerant bounds (f32 divergence
    # compounds through 12 fwd/bwd + EMA + queue cycles)
    for i, ((c_r, d_r, k_r), (c_g, d_g, k_g)) in enumerate(
        zip(ref_curve, got_curve)
    ):
        tol = 2e-3 * (1 + i)
        assert abs(c_g - c_r) / max(abs(c_r), 1e-3) < tol, (i, c_g, c_r)
        assert abs(k_g - k_r) / max(abs(k_r), 1e-3) < tol, (i, k_g, k_r)
        assert abs(d_g - d_r) < max(tol * abs(d_r), 5e-4 * (1 + i)), (i, d_g, d_r)

    # queue wrapped exactly once: ptr = (12*8) % 64
    assert int(state.queue.ptr) == (N_STEPS * B) % K == 32
    np.testing.assert_allclose(
        np.asarray(state.queue.memory["memory"]), mem.memory.numpy(),
        rtol=5e-3, atol=5e-4,
    )

    # EMA teacher after 12 steps matches elementwise (compounded EMA +
    # BN running stats through 24 train-mode forwards)
    conv_post_t = convert_state_dict(
        {kk: vv.numpy() for kk, vv in model_t.state_dict().items()},
        {"params": conv_t["params"], "batch_stats": conv_t["batch_stats"]},
    )
    for tree_got, tree_want, what in (
        (state.teacher_params, conv_post_t["params"], "teacher_params"),
        (state.teacher_batch_stats, conv_post_t["batch_stats"], "teacher_bs"),
    ):
        got = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, tree_got)
        ))
        for path, want in jax.tree_util.tree_leaves_with_path(tree_want):
            np.testing.assert_allclose(
                got[path], want, rtol=5e-3, atol=5e-4,
                err_msg=f"{what}{path}",
            )
