"""Rank worker for the 2-rank gloo reference oracle (test_moma_local_bn).

Executes ONE reference MoMA step as rank r of world 2 on CPU — the real
modules (MoMA/mem_moco.MoCo, MoMA/criterion_moco_att.CMO, learning/
contrast_trainer.ContrastTrainer) wired exactly as helper/
loops_moma.py:244-361, with REAL 2-rank collectives: _shuffle_bn's
all_gather/broadcast crosses process boundaries and every BatchNorm sees
only its rank's half-batch (the per-GPU local-BN semantics the TPU
build's bn='local' shard_map mode reproduces).  Gradients are
all-reduce-averaged like DDP.  Results are torch.save'd per rank.

Usage: python ref_moma_2rank_worker.py <rank> <world> <tmpdir> <port>
"""

import copy
import os
import sys
import types

import numpy as np

RANK = int(sys.argv[1])
WORLD = int(sys.argv[2])
TMP = sys.argv[3]
PORT = sys.argv[4]

REF = "/root/reference"
sys.path.insert(0, REF)
sys.modules.setdefault("tensorboard_logger", types.ModuleType("tensorboard_logger"))

import torch  # noqa: E402
import torch.distributed as dist  # noqa: E402
import torch.nn as nn  # noqa: E402

# CPU-only run of CUDA-assuming reference code
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]

data = np.load(os.path.join(TMP, "inputs.npz"))
_perm = torch.from_numpy(data["perm"]).long()
# _shuffle_bn draws torch.randperm then broadcasts from rank 0; pinning
# the draw on both ranks keeps the broadcast a no-op and the permutation
# equal to the one fed to the TPU step under test
torch.randperm = lambda n, **kw: _perm.clone()  # type: ignore[assignment]

N_CLS = int(data["n_cls"])
FEAT = int(data["feat_dim"])
K = int(data["nce_k"])
T_NCE = float(data["nce_t"])
ALPHA = float(data["alpha"])
C_CLS, C_DIV, C_BETA = (float(x) for x in data["cdb"])
KD_T = float(data["kd_t"])

dist.init_process_group(
    "gloo", init_method=f"tcp://127.0.0.1:{PORT}", rank=RANK, world_size=WORLD
)

from distiller_zoo import DistillKL  # noqa: E402
from learning.contrast_trainer import ContrastTrainer  # noqa: E402
from MoMA.criterion_moco_att import CMO  # noqa: E402
from MoMA.mem_moco import MoCo  # noqa: E402
from models.resnet import resnet8  # noqa: E402

S_DIM = 64  # resnet8 pooled dim

opt = types.SimpleNamespace(
    s_dim=S_DIM, t_dim=S_DIM, feat_dim=FEAT, head="mlp", attn="self",
    nce_k=K, nce_t=T_NCE, nce_m=0.5, n_data=100,
    local_rank=RANK, node_rank=0, ngpus_per_node=WORLD, mem="MoCo",
)

torch.manual_seed(0)  # identical init on both ranks (DDP broadcast stand-in)
model_s = resnet8(num_classes=N_CLS)
model_t = resnet8(num_classes=N_CLS)
cmo = CMO(opt)
mem = MoCo(FEAT, K=K, T=T_NCE)
with torch.no_grad():
    mem.memory.copy_(torch.from_numpy(data["memory"]))

snap = {
    "model_s": copy.deepcopy(model_s.state_dict()),
    "model_t": copy.deepcopy(model_t.state_dict()),
    "cmo": copy.deepcopy(cmo.state_dict()),
}

B_global = data["images"].shape[0]
bl = B_global // WORLD
images = torch.from_numpy(data["images"][RANK * bl:(RANK + 1) * bl])
labels = torch.from_numpy(data["labels"][RANK * bl:(RANK + 1) * bl])

model_s.train()
model_t.eval()  # per-epoch reset state: step-1 KL forward uses running stats
cmo.train()

# loops_moma.py:268-279 — LOCAL half-batch forwards (per-rank BN)
feat_s, logit_s = model_s(images, is_feat=True)
with torch.no_grad():
    feat_t, logit_t = model_t(images, is_feat=True)
loss_cls = nn.CrossEntropyLoss()(logit_s, labels)
loss_div = DistillKL(KD_T)(logit_s, logit_t)

# loops_moma.py:309-320 — EMA before keys; teacher BN to train mode
trainer = ContrastTrainer.__new__(ContrastTrainer)
trainer.args = opt
trainer.local_group = None  # single node: the local group IS the world
trainer.momentum_update(model_s, model_t, ALPHA)
cmo.embed_t.eval()
trainer.momentum_update(cmo.embed_s, cmo.embed_t, ALPHA)
for m in model_t.modules():
    if "BatchNorm" in m.__class__.__name__:
        m.train()
# REAL 2-rank Shuffle-BN: all_gather images, shared perm, per-rank
# momentum forward (local BN), global key gather, unshuffle
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

# DDP's implicit gradient all-reduce-average
for module in (model_s, cmo):
    for p in module.parameters():
        if p.grad is not None:
            dist.all_reduce(p.grad, op=dist.ReduceOp.SUM)
            p.grad /= WORLD


def grad_dict(module):
    grads = {n: p.grad for n, p in module.named_parameters()}
    out = {}
    for name, tensor in module.state_dict().items():
        if name in grads and grads[name] is not None:
            out[name] = grads[name].numpy().copy()
        else:
            out[name] = np.zeros_like(tensor.numpy())
    return out


result = {
    "losses": tuple(
        float(x.detach()) for x in (loss_cls, loss_div, loss_kd, total)
    ),
    # averaged grads are identical on both ranks; per-rank BN stats differ
    "grads_s": grad_dict(model_s),
    "grads_cmo": grad_dict(cmo),
    "post_memory": mem.memory.numpy().copy(),
    "post_ptr": int(mem.index),
    "post_teacher": {k2: v.numpy().copy()
                     for k2, v in model_t.state_dict().items()},
    "post_student": {k2: v.numpy().copy()
                     for k2, v in model_s.state_dict().items()},
}
if RANK == 0:
    result["snap"] = {
        name: {k2: v.numpy().copy() for k2, v in sd.items()}
        for name, sd in snap.items()
    }
torch.save(result, os.path.join(TMP, f"out_rank{RANK}.pt"))
dist.barrier()
dist.destroy_process_group()
print(f"rank {RANK}: ok")
