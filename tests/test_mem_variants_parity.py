"""MoCo memory-variant oracle parity vs the reference classes.

test_moma_step_parity pins the full MoCo+'self' step; this pins the
remaining variants at module level against the reference run on CPU:

  MoCoST    dual s/t banks -> (logits_ss, logits_st)   (mem_moco.py:165-204)
  MoCoSSTT  dual banks x optional dual queries          (:208-253)
  MoCoAtt   attention applied INSIDE forward, all six
            attn modes (all/qk/dual/dual2/self_qk/self) (:103-161)

Module level is the strongest possible pin here: the reference's OWN
training loop cannot drive MoCoST/MoCoSSTT (it calls contrast(q, k,
all_k) while their forward requires k_t — a TypeError; CLI-selectable
but latently broken, like the loops_RFF/model7 imports).  Our runners
repair this by feeding the momentum-encoder keys to both banks (and the
fixed teacher's keys in cross-arch mode) — documented in train/moma.py.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moma_tpu.models.torch_import import convert_state_dict  # noqa: E402
from moma_tpu.moma.cmo import CMOHeads  # noqa: E402
from moma_tpu.moma.queue import (  # noqa: E402
    QueueState,
    step_moco_att,
    step_moco_sstt,
    step_moco_st,
)

B, FEAT, K, T = 8, 32, 64, 0.15


@pytest.fixture(autouse=True)
def no_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self,
                        raising=False)
    orig_zeros = torch.zeros

    class _Z:
        def __getattr__(self, n):
            return getattr(orig_zeros, n)

    def zeros(*a, **kw):
        t = orig_zeros(*a, **kw)
        return t

    monkeypatch.setattr(torch, "zeros", zeros, raising=False)


def _unit(rs, *shape):
    x = rs.randn(*shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _vectors(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "q": _unit(rs, B, FEAT),
        "k": _unit(rs, B, FEAT),
        "q_t": _unit(rs, B, FEAT),
        "k_t": _unit(rs, B, FEAT),
        "mem_s": _unit(rs, K, FEAT),
        "mem_t": _unit(rs, K, FEAT),
    }


def _queue(v, names):
    return QueueState(
        memory={n: jnp.asarray(v["mem_s" if n.endswith("_s") or n == "memory"
                                 else "mem_t"]) for n in names},
        ptr=jnp.zeros((), jnp.int32),
    )


def test_moco_st_parity():
    from MoMA.mem_moco import MoCoST

    v = _vectors(1)
    ref = MoCoST(FEAT, K=K, T=T)
    with torch.no_grad():
        ref.memory_s.copy_(torch.from_numpy(v["mem_s"]))
        ref.memory_t.copy_(torch.from_numpy(v["mem_t"]))
    l_ss, l_st, labels = ref(
        torch.from_numpy(v["q"]), torch.from_numpy(v["k"]),
        torch.from_numpy(v["k_t"]),
    )

    st = _queue(v, ("memory_s", "memory_t"))
    g_ss, g_st, new = step_moco_st(
        st, jnp.asarray(v["q"]), jnp.asarray(v["k"]), jnp.asarray(v["k_t"]),
        None, None, T,
    )
    np.testing.assert_allclose(np.asarray(g_ss), l_ss.numpy(), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_st), l_st.numpy(), rtol=1e-4,
                               atol=1e-6)
    assert labels.numpy().sum() == 0  # positives at column 0
    np.testing.assert_allclose(
        np.asarray(new.memory["memory_s"]), ref.memory_s.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new.memory["memory_t"]), ref.memory_t.numpy(), rtol=1e-5
    )
    assert int(new.ptr) == ref.index == B


@pytest.mark.parametrize("dual_query", [False, True])
def test_moco_sstt_parity(dual_query):
    from MoMA.mem_moco import MoCoSSTT

    v = _vectors(2)
    ref = MoCoSSTT(FEAT, K=K, T=T)
    with torch.no_grad():
        ref.memory_s.copy_(torch.from_numpy(v["mem_s"]))
        ref.memory_t.copy_(torch.from_numpy(v["mem_t"]))
    args = [torch.from_numpy(v["q"]), torch.from_numpy(v["k"])]
    q_t = torch.from_numpy(v["q_t"]) if dual_query else None
    out = ref(*args, q_t=q_t, k_t=torch.from_numpy(v["k_t"]))
    ref_logits, _labels = out[:-1], out[-1]

    st = _queue(v, ("memory_s", "memory_t"))
    ours = step_moco_sstt(
        st, jnp.asarray(v["q"]), jnp.asarray(v["k"]),
        jnp.asarray(v["q_t"]) if dual_query else None,
        jnp.asarray(v["k_t"]), None, None, T,
    )
    got_logits, new = ours[:-1], ours[-1]
    assert len(got_logits) == len(ref_logits) == (4 if dual_query else 2)
    for g, r in zip(got_logits, ref_logits):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=1e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new.memory["memory_s"]), ref.memory_s.numpy(), rtol=1e-5
    )


@pytest.mark.parametrize("attn", ["all", "qk", "dual", "dual2", "self_qk", "self"])
def test_moco_att_parity(attn):
    """MoCoAtt with shared attention weights, every attn routing mode.
    (Dead code from the reference CLI — argparse excludes MoCoAtt — but
    implemented and exposed here, SURVEY.md §2.2.)"""
    from MoMA.criterion_moco_att import CMO
    from MoMA.mem_moco import MoCoAtt

    v = _vectors(3)
    opt = types.SimpleNamespace(s_dim=FEAT, t_dim=FEAT, feat_dim=FEAT,
                                head="linear", attn=attn)
    torch.manual_seed(0)
    cmo = CMO(opt)
    cmo.eval()
    ref = MoCoAtt(FEAT, K=K, T=T)
    with torch.no_grad():
        ref.memory.copy_(torch.from_numpy(v["mem_s"]))
    with torch.no_grad():
        l_ref, _ = ref(
            torch.from_numpy(v["q"]), torch.from_numpy(v["k"]),
            attn=attn, criterion_kd=cmo,
        )

    heads = CMOHeads(head="linear", attn=attn, feat_dim=FEAT, s_dim=FEAT,
                     t_dim=FEAT)
    params, _bs = heads.init(jax.random.PRNGKey(0))
    # convert ONLY the attention-module weights (embed heads unused here)
    att_names = [n for n in params if n.startswith("atts")]
    att_sd = {kk: vv.numpy() for kk, vv in cmo.state_dict().items()
              if kk.startswith("atts")}
    conv = convert_state_dict(
        att_sd, {"params": {n: params[n] for n in att_names}}
    )["params"]
    params = {**params, **conv}

    st = _queue(v, ("memory",))
    logits, new = step_moco_att(
        st, jnp.asarray(v["q"]), jnp.asarray(v["k"]), None, T,
        attn, heads.attn_fns(params),
    )
    # dual2's pos-only logits: the reference .squeeze()s to (B,) —
    # (mem_moco.py:63-66) — we keep (B, 1); values must match
    np.testing.assert_allclose(
        np.asarray(logits).reshape(l_ref.shape), l_ref.numpy(), rtol=2e-4,
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new.memory["memory"]), ref.memory.numpy(), rtol=1e-4,
        atol=1e-6,
    )
    assert int(new.ptr) == ref.index


def test_reference_loop_cannot_drive_mocost():
    """Documents the reference defect our runner repairs: the moma loop's
    contrast(q, k, all_k) call (loops_moma.py:331) is incompatible with
    MoCoST.forward(q, k, k_t, ...) — all_k lands in the k_t slot, leaving
    the all_k kwarg empty and the queue advanced by per-node k only; with
    default kwargs absent it is simply a broken contract the reference
    never exercised (no tests)."""
    import inspect

    from MoMA.mem_moco import MoCoST

    sig = inspect.signature(MoCoST.forward)
    params = list(sig.parameters)
    assert params[:4] == ["self", "q", "k", "k_t"]
