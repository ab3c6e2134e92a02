"""Golden-value parity tests: every functional KD loss vs the REFERENCE
torch implementation imported from /root/reference (CPU-safe modules
only).  This is the strongest parity check available: identical inputs
(NCHW torch vs NHWC jnp transposed), outputs must match to float32
tolerance.  Skipped wholesale when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

import moma_tpu.losses.functional as F  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "distiller_zoo")),
    reason="reference tree not available",
)

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    """The reference hardcodes .cuda() in constructors (crd/memory.py:14,
    mem_moco labels); neutralize on CPU-only torch."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False
    )
    yield


def _pair(shape, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.randn(*shape).astype(np.float32)
    b = rs.randn(*shape).astype(np.float32)
    return a, b


def _t(x):  # NCHW torch tensor
    return torch.from_numpy(x)


def _j(x):  # NHWC jnp array
    if x.ndim == 4:
        return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    return jnp.asarray(x)


def test_kd_kl():
    from distiller_zoo import DistillKL

    s, t = _pair((8, 100), seed=1)
    want = DistillKL(T=4)(_t(s), _t(t)).item()
    got = float(F.kd_kl(_j(s), _j(t), T=4))
    assert got == pytest.approx(want, rel=1e-5)


def test_attention_transfer():
    from distiller_zoo import Attention

    g_s = [_pair((4, 8, 16, 16), seed=2)[0], _pair((4, 16, 8, 8), seed=3)[0]]
    g_t = [_pair((4, 12, 16, 16), seed=4)[0], _pair((4, 24, 8, 8), seed=5)[0]]
    want = sum(l.item() for l in Attention()( [_t(x) for x in g_s], [_t(x) for x in g_t]))
    got = float(F.attention_transfer([_j(x) for x in g_s], [_j(x) for x in g_t]))
    assert got == pytest.approx(want, rel=1e-4)


def test_attention_transfer_mismatched_sizes():
    from distiller_zoo import Attention

    f_s, _ = _pair((4, 8, 16, 16), seed=6)
    f_t, _ = _pair((4, 8, 11, 11), seed=7)  # non-divisible pooling path
    want = sum(l.item() for l in Attention()([_t(f_s)], [_t(f_t)]))
    got = float(F.attention_transfer([_j(f_s)], [_j(f_t)]))
    assert got == pytest.approx(want, rel=1e-4)


def test_similarity_preserving():
    from distiller_zoo import Similarity

    f_s, f_t = _pair((6, 8, 4, 4), seed=8)
    want = sum(l.item() for l in Similarity()([_t(f_s)], [_t(f_t)]))
    got = float(F.similarity_preserving([_j(f_s)], [_j(f_t)]))
    assert got == pytest.approx(want, rel=1e-4)


def test_nst():
    from distiller_zoo import NSTLoss

    f_s, _ = _pair((3, 8, 6, 6), seed=9)
    f_t, _ = _pair((3, 12, 6, 6), seed=10)
    want = sum(l.item() for l in NSTLoss()([_t(f_s)], [_t(f_t)]))
    got = float(F.nst_loss([_j(f_s)], [_j(f_t)]))
    assert got == pytest.approx(want, rel=1e-4)


def test_rkd():
    from distiller_zoo import RKDLoss

    f_s, f_t = _pair((10, 32), seed=11)
    want = RKDLoss()(_t(f_s), _t(f_t)).item()
    got = float(F.rkd_loss(_j(f_s), _j(f_t)))
    assert got == pytest.approx(want, rel=1e-4)


def test_pkt():
    from distiller_zoo import PKT

    f_s, f_t = _pair((12, 64), seed=12)
    want = PKT()(_t(f_s), _t(f_t)).item()
    got = float(F.pkt_loss(_j(f_s), _j(f_t)))
    assert got == pytest.approx(want, rel=1e-4)


def test_correlation():
    from distiller_zoo import Correlation

    e_s, e_t = _pair((8, 128), seed=13)
    want = Correlation()(_t(e_s), _t(e_t)).item()
    got = float(F.cc_loss(_j(e_s), _j(e_t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_hint_mse():
    from distiller_zoo import HintLoss

    f_s, f_t = _pair((4, 8, 8, 8), seed=14)
    want = HintLoss()(_t(f_s), _t(f_t)).item()
    got = float(F.hint_mse(_j(f_s), _j(f_t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_fsp():
    from distiller_zoo import FSP

    g_s = [_pair((4, 8, 16, 16), seed=15)[0], _pair((4, 8, 8, 8), seed=16)[0]]
    g_t = [_pair((4, 8, 16, 16), seed=17)[0], _pair((4, 8, 8, 8), seed=18)[0]]
    shapes = [x.shape for x in g_s]
    mod = FSP(shapes, [x.shape for x in g_t])
    want = sum(l.item() for l in mod([_t(x) for x in g_s], [_t(x) for x in g_t]))
    got = float(F.fsp_loss([_j(x) for x in g_s], [_j(x) for x in g_t]))
    assert got == pytest.approx(want, rel=1e-4)


def test_ab():
    from distiller_zoo import ABLoss

    g_s = [_pair((4, 8, 8, 8), seed=19)[0], _pair((4, 16, 4, 4), seed=20)[0]]
    g_t = [_pair((4, 8, 8, 8), seed=21)[0], _pair((4, 16, 4, 4), seed=22)[0]]
    mod = ABLoss(feat_num=2)
    want = sum(l.item() for l in mod([_t(x) for x in g_s], [_t(x) for x in g_t]))
    got = float(F.ab_loss([_j(x) for x in g_s], [_j(x) for x in g_t]))
    assert got == pytest.approx(want, rel=1e-4)


def test_ft():
    from distiller_zoo import FactorTransfer

    f_s, _ = _pair((4, 8, 8, 8), seed=23)
    f_t, _ = _pair((4, 16, 8, 8), seed=24)
    want = FactorTransfer()(_t(f_s), _t(f_t)).item()
    got = float(F.ft_loss(F.ft_factor(_j(f_s)), F.ft_factor(_j(f_t))))
    assert got == pytest.approx(want, rel=1e-4)


def test_kdsvd():
    from distiller_zoo import KDSVD

    g_s = [_pair((3, 8, 4, 4), seed=25)[0], _pair((3, 16, 4, 4), seed=26)[0]]
    g_t = [_pair((3, 8, 4, 4), seed=27)[0], _pair((3, 16, 4, 4), seed=28)[0]]
    want = sum(l.item() for l in KDSVD()([_t(x) for x in g_s], [_t(x) for x in g_t]))
    got = float(F.kdsvd_loss([_j(x) for x in g_s], [_j(x) for x in g_t]))
    # SVD sign/ordering is solver-dependent; the aligned loss should still
    # agree to loose tolerance
    assert got == pytest.approx(want, rel=5e-2, abs=1e-3)


def test_crd_loss_parity():
    """CRD scores + Eq18 loss vs the reference ContrastMemory/ContrastLoss
    run on CPU with identical banks and indices."""
    sys.path.insert(0, REF)
    from crd.memory import ContrastMemory
    from crd.criterion import ContrastLoss

    from moma_tpu.losses.crd import CRDMemory, crd_loss

    n_data, feat_dim, K, B = 64, 16, 7, 5
    rs = np.random.RandomState(0)

    def unit(x):  # Embed L2-normalizes before the memory (crd/criterion.py:40-41)
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    v1 = unit(rs.randn(n_data, feat_dim))
    v2 = unit(rs.randn(n_data, feat_dim))
    f_s = unit(rs.randn(B, feat_dim))
    f_t = unit(rs.randn(B, feat_dim))
    idx = rs.choice(n_data, B, replace=False)
    contrast_idx = np.concatenate(
        [idx[:, None], rs.randint(0, n_data, (B, K))], axis=1
    )

    # torch reference (monkeypatch the .cuda() of AliasMethod away)
    mem = ContrastMemory(feat_dim, n_data, K, T=0.07, momentum=0.5)
    mem.memory_v1.copy_(torch.from_numpy(v1))
    mem.memory_v2.copy_(torch.from_numpy(v2))
    out_v1, out_v2 = mem(
        torch.from_numpy(f_s), torch.from_numpy(f_t),
        torch.from_numpy(idx), torch.from_numpy(contrast_idx),
    )
    crit = ContrastLoss(n_data)
    want = (crit(out_v1) + crit(out_v2)).item()

    jmem = CRDMemory(
        v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        z_v1=jnp.asarray(-1.0), z_v2=jnp.asarray(-1.0),
    )
    got, new_mem = crd_loss(
        jmem, jnp.asarray(f_s), jnp.asarray(f_t),
        jnp.asarray(idx), jnp.asarray(contrast_idx),
        nce_t=0.07, momentum=0.5,
    )
    assert float(got) == pytest.approx(want, rel=1e-4)
    # bank rows at idx must match the torch post-update banks
    np.testing.assert_allclose(
        np.asarray(new_mem.v1)[idx], mem.memory_v1.numpy()[idx], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_mem.v2)[idx], mem.memory_v2.numpy()[idx], rtol=1e-4
    )


def test_moco_logits_parity():
    """MoCo queue logits vs reference mem_moco.MoCo on CPU."""
    sys.path.insert(0, REF)
    import importlib

    # mem_moco calls .cuda() on labels only inside forward; patch torch.cuda
    mem_moco = importlib.import_module("MoMA.mem_moco")

    from moma_tpu.moma.queue import QueueState, step_moco

    K, D, B = 32, 8, 4
    rs = np.random.RandomState(0)
    memory = rs.randn(K, D).astype(np.float32)
    memory /= np.linalg.norm(memory, axis=1, keepdims=True)
    q = rs.randn(B, D).astype(np.float32)
    k = rs.randn(B, D).astype(np.float32)

    ref = mem_moco.MoCo(D, K=K, T=0.07)
    with torch.no_grad():
        ref.memory.copy_(torch.from_numpy(memory))
    orig_zeros = torch.zeros
    try:
        # reference hardcodes labels .cuda(); run logits path only
        queue = ref.memory.clone().detach()
        want_logits = ref._compute_logit(
            torch.from_numpy(q), torch.from_numpy(k), queue
        ).numpy()
    finally:
        torch.zeros = orig_zeros

    jq = QueueState(
        memory={"memory": jnp.asarray(memory)}, ptr=jnp.zeros((), jnp.int32)
    )
    got_logits, new_q = step_moco(jq, jnp.asarray(q), jnp.asarray(k), None, 0.07)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, rtol=1e-4)
    # reference then updates memory with k and advances pointer
    ref._update_memory(torch.from_numpy(k), ref.memory)
    ref._update_pointer(B)
    np.testing.assert_allclose(
        np.asarray(new_q.memory["memory"]), ref.memory.numpy(), rtol=1e-4
    )
    assert int(new_q.ptr) == ref.index
