"""kl_teacher_bn='exact' — the reference's REAL teacher-BN schedule.

train_distill_moma resets model_t.eval() at the start of EVERY epoch
(reference helper/loops_moma.py:224-227), then set_bn_train flips the BN
layers back to train mode inside step 1 (:314-318) where they stay until
the next epoch.  So the KL forward sees running statistics on each
epoch's FIRST batch and batch statistics afterwards.  'train'/'eval'
approximate this with one fixed mode (one-step-per-epoch deviation,
PARITY.md); 'exact' rebuilds both step programs and dispatches per batch
— this file pins it against a live reference run across an epoch
boundary, where the two modes genuinely diverge.
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
ALPHA = 0.9
LR = 0.05
KD_T = 4.0
N_EPOCHS, STEPS_PER_EPOCH = 2, 4


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
            "gloo", init_method="tcp://127.0.0.1:29527", rank=0, world_size=1
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"gloo unavailable: {e}")
    yield
    dist.destroy_process_group()


def test_exact_bn_loss_curve_parity_across_epochs(gloo_group, patched_torch):
    import copy

    import torch.nn as nn
    from torch.nn.modules.batchnorm import _BatchNorm
    from distiller_zoo import DistillKL
    from learning.contrast_trainer import ContrastTrainer
    from MoMA.criterion_moco_att import CMO
    from MoMA.mem_moco import MoCo
    from models.resnet import resnet8

    rs = np.random.RandomState(33)
    batches = [(rs.rand(B, 3, HW, HW).astype(np.float32),
                rs.randint(0, N_CLS, (B,)).astype(np.int64))
               for _ in range(N_EPOCHS * STEPS_PER_EPOCH)]
    memory_np = rs.randn(K, FEAT).astype(np.float32)
    memory_np /= np.linalg.norm(memory_np, axis=1, keepdims=True)

    # ---------------- reference: the REAL per-epoch schedule
    opt_shim = types.SimpleNamespace(
        s_dim=S_DIM, t_dim=S_DIM, feat_dim=FEAT, head="mlp", attn="self",
        local_rank=0, node_rank=0, ngpus_per_node=1, mem="MoCo",
    )
    torch.manual_seed(9)
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

    def set_bn_train(m):  # loops_moma.py:314-318
        if isinstance(m, _BatchNorm):
            m.train()

    ce = nn.CrossEntropyLoss()
    kl = DistillKL(KD_T)
    ref_curve = []
    it = iter(batches)
    for _epoch in range(N_EPOCHS):
        model_s.train()
        cmo.train()
        model_t.eval()  # per-epoch reset (loops_moma.py:224-227)
        for _ in range(STEPS_PER_EPOCH):
            images_np, labels_np = next(it)
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
            model_t.apply(set_bn_train)  # persists until next epoch's eval()
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

    # ---------------- ours: two jitted programs, per-batch dispatch
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
                          shuffle_bn=False, kl_teacher_bn="exact")
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
    step_first = make_moma_train_step(cfg, heads, augment_fn=None,
                                      donate=False, kl_train_bn_override=False)
    step_rest = make_moma_train_step(cfg, heads, augment_fn=None,
                                     donate=False, kl_train_bn_override=True)

    got_curve = []
    it = iter(batches)
    i = 0
    for _epoch in range(N_EPOCHS):
        for s in range(STEPS_PER_EPOCH):
            images_np, labels_np = next(it)
            batch = {
                "image": jax.device_put(np.transpose(images_np, (0, 2, 3, 1)),
                                        data_sharding(mesh)),
                "label": jax.device_put(labels_np.astype(np.int32),
                                        data_sharding(mesh, ndim=1)),
            }
            fn = step_first if s == 0 else step_rest
            state, metrics = fn(state, batch, jax.random.PRNGKey(100 + i))
            got_curve.append((float(metrics["loss_cls"]),
                              float(metrics["loss_div"]),
                              float(metrics["loss_kd"])))
            i += 1

    for i, ((c_r, d_r, k_r), (c_g, d_g, k_g)) in enumerate(
        zip(ref_curve, got_curve)
    ):
        tol = 2e-3 * (1 + i)
        assert abs(c_g - c_r) / max(abs(c_r), 1e-3) < tol, (i, c_g, c_r)
        assert abs(k_g - k_r) / max(abs(k_r), 1e-3) < tol, (i, k_g, k_r)
        assert abs(d_g - d_r) < max(tol * abs(d_r), 5e-4 * (1 + i)), (i, d_g, d_r)

    # teacher running stats after the full schedule (eval-KL forwards must
    # NOT have contributed stat updates; 2 epochs x (1 eval + train) mix)
    conv_post_t = convert_state_dict(
        {kk: vv.numpy() for kk, vv in model_t.state_dict().items()},
        {"params": conv_t["params"], "batch_stats": conv_t["batch_stats"]},
    )
    got = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, state.teacher_batch_stats)
    ))
    for path, want in jax.tree_util.tree_leaves_with_path(
        conv_post_t["batch_stats"]
    ):
        np.testing.assert_allclose(got[path], want, rtol=5e-3, atol=5e-4,
                                   err_msg=str(path))


def test_exact_mode_steps_differ_on_first_batch(mesh8):
    """The two compiled programs are genuinely different: with running
    stats far from the batch stats, the eval-BN KL forward produces a
    different loss_div than the train-BN one on the same state/batch."""
    from tests.test_moma import _batch, _setup, B as TB, FEAT as TFEAT
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.models import create_model
    from moma_tpu.train.moma import make_moma_train_step

    cfg, state, _ = _setup(mesh8)
    cfg.moma.kl_teacher_bn = "exact"
    fs, _ = probe_shapes(create_model("resnet8", num_classes=10), 32, TB)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=TFEAT, s_dim=s_dim,
                     t_dim=s_dim)
    aug = lambda im, r: im.astype(jnp.float32) / 255.0
    first = make_moma_train_step(cfg, heads, augment_fn=aug, donate=False,
                                 kl_train_bn_override=False)
    rest = make_moma_train_step(cfg, heads, augment_fn=aug, donate=False,
                                kl_train_bn_override=True)
    batch = _batch(mesh8)
    _, m_first = first(state, batch, jax.random.PRNGKey(0))
    _, m_rest = rest(state, batch, jax.random.PRNGKey(0))
    assert not np.isclose(float(m_first["loss_div"]),
                          float(m_rest["loss_div"]), rtol=1e-4), (
        "eval-BN and train-BN KL forwards coincided — override not applied")
    # everything downstream of KL is identical: the key forward is always
    # train-mode, so loss_kd must match between the two programs
    np.testing.assert_allclose(float(m_first["loss_kd"]),
                               float(m_rest["loss_kd"]), rtol=1e-5)


def test_exact_default_and_bare_build_is_steady_state(mesh8):
    """'exact' is the DEFAULT since round 3 (config dataclass + CLI), and
    a BARE step build under it (no kl_train_bn_override — no epoch
    structure exists for a lone step) is the steady-state train-BN
    program: its losses match an explicit kl_train_bn_override=True
    build bit-for-bit."""
    from moma_tpu.core.config import Config, MomaConfig, student_parser

    from tests.test_moma import _batch, _setup, B as TB, FEAT as TFEAT
    from moma_tpu.models import create_model
    from moma_tpu.moma.cmo import CMOHeads
    from moma_tpu.train.distill import probe_shapes
    from moma_tpu.train.moma import make_moma_train_step

    assert Config().moma.kl_teacher_bn == "exact"
    assert MomaConfig().kl_teacher_bn == "exact"
    a = student_parser().parse_args(["--distill", "moma"])
    assert a.kl_teacher_bn == "exact"

    cfg, state, _ = _setup(mesh8)
    cfg.moma.kl_teacher_bn = "exact"
    fs, _ = probe_shapes(create_model("resnet8", num_classes=10), 32, TB)
    s_dim = fs[-1][-1]
    heads = CMOHeads(head="mlp", attn="self", feat_dim=TFEAT, s_dim=s_dim,
                     t_dim=s_dim)
    aug = lambda im, r: im.astype(jnp.float32) / 255.0
    with pytest.warns(UserWarning, match="steady-state"):
        bare = make_moma_train_step(cfg, heads, augment_fn=aug, donate=False)
    steady = make_moma_train_step(cfg, heads, augment_fn=aug, donate=False,
                                  kl_train_bn_override=True)
    batch = _batch(mesh8)
    _, m_bare = bare(state, batch, jax.random.PRNGKey(0))
    _, m_steady = steady(state, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_div", "loss_kd"):
        assert float(m_bare[k]) == float(m_steady[k])
