"""Ring flash attention (ops/ring_attention.py) vs the dense replicated
BatchTokenAttention — values, gradients, and the gradient-replication
convention the sharded MoMA step depends on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from moma_tpu.core.mesh import shard_map_compat
from moma_tpu.moma.cmo import BatchTokenAttention
from moma_tpu.ops.ring_attention import ring_batch_token_attention

pytestmark = pytest.mark.quick

MP = 4
# KTOT deliberately larger than every channel-ish dim (3C=48) so the
# memory test's "no K-sized axis" walk can't false-positive on qkv widths
NB, KTOT, C, H = 6, 64, 16, 4


@pytest.fixture(scope="module")
def mesh_mp():
    return Mesh(np.array(jax.devices()[:MP]), ("model",))


def _params_and_inputs(seed=0):
    rs = np.random.RandomState(seed)
    mod = BatchTokenAttention(C, num_heads=H, qkv_bias=True)
    x_all = jnp.asarray(rs.randn(NB + KTOT, C).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x_all)
    p = v["params"]
    kern = (p["TorchLinear_0"]["kernel"], p["TorchLinear_0"]["bias"],
            p["TorchLinear_1"]["kernel"], p["TorchLinear_1"]["bias"])
    return mod, p, kern, x_all


def _shard_map_ring(mesh, kern):
    qkv_k, qkv_b, proj_k, proj_b = kern

    def body(x_rep, x_loc, qkv_k, qkv_b, proj_k, proj_b):
        return ring_batch_token_attention(
            x_rep, x_loc, qkv_k, qkv_b, proj_k, proj_b, H, "model")

    return shard_map_compat(
        body, mesh,
        in_specs=(P(), P("model", None), P(), P(), P(), P()),
        out_specs=(P(), P("model", None)),
    )


def test_ring_matches_dense_forward(mesh_mp):
    mod, p, kern, x_all = _params_and_inputs()
    want = mod.apply({"params": p}, x_all)
    fn = jax.jit(_shard_map_ring(mesh_mp, kern))
    out_rep, out_loc = fn(x_all[:NB], x_all[NB:], *kern)
    got = jnp.concatenate([out_rep, out_loc], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_matches_dense_forward_no_rep(mesh_mp):
    """Nb=0 (the 'self' family's atts_queue: bank rows only)."""
    mod, p, kern, x_all = _params_and_inputs(seed=3)
    xq = x_all[NB:]
    want = mod.apply({"params": p}, xq)
    fn = jax.jit(_shard_map_ring(mesh_mp, kern))
    _, out_loc = fn(xq[:0], xq, *kern)
    np.testing.assert_allclose(np.asarray(out_loc), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_grads_match_dense(mesh_mp):
    """Full-gradient parity under the step's IN-BODY convention: grads
    are computed inside the shard_map body (like the sharded MoMA step —
    there is no boundary psum on grads), with out_loc consumed through
    an all_gather + _grad_div exactly as sharded_queue_logits_t does.
    Every model rank must then hold the SAME full gradients as dense
    single-device autodiff of the single global loss."""
    from moma_tpu.moma.queue import _grad_div

    mod, p, kern, x_all = _params_and_inputs(seed=1)
    x_rep, x_loc = x_all[:NB], x_all[NB:]
    w_rep = jnp.asarray(np.random.RandomState(7).randn(NB, C), jnp.float32)
    w_loc = jnp.asarray(np.random.RandomState(8).randn(KTOT, C), jnp.float32)

    def dense_loss(x_rep, qkv_k, qkv_b, proj_k, proj_b):
        p2 = {"TorchLinear_0": {"kernel": qkv_k, "bias": qkv_b},
              "TorchLinear_1": {"kernel": proj_k, "bias": proj_b}}
        out = mod.apply({"params": p2},
                        jnp.concatenate([x_rep, x_loc], axis=0))
        return jnp.sum(out[:NB] * w_rep) + jnp.sum(out[NB:] * w_loc)

    want = jax.grad(dense_loss, argnums=(0, 1, 2, 3, 4))(x_rep, *kern)

    def body(x_rep, x_loc, w_loc_sh, qkv_k, qkv_b, proj_k, proj_b):
        def loss_fn(x_rep, qkv_k, qkv_b, proj_k, proj_b):
            out_rep, out_loc = ring_batch_token_attention(
                x_rep, x_loc, qkv_k, qkv_b, proj_k, proj_b, H, "model")
            gathered = jax.lax.all_gather(
                _grad_div(out_loc, "model"), "model", axis=0, tiled=True)
            w_full = jax.lax.all_gather(w_loc_sh, "model", axis=0,
                                        tiled=True)
            return jnp.sum(out_rep * w_rep) + jnp.sum(gathered * w_full)

        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            x_rep, qkv_k, qkv_b, proj_k, proj_b)

    fn = shard_map_compat(
        body, mesh_mp,
        in_specs=(P(), P("model", None), P("model", None),
                  P(), P(), P(), P()),
        out_specs=(P(),) * 5,
    )
    got = jax.jit(fn)(x_rep, x_loc, w_loc, *kern)
    names = ("x_rep", "qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias")
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=name)


def test_ring_never_materializes_full_bank(mesh_mp):
    """The memory claim: per-device live arrays stay O(Nb + 2*Ksh) rows —
    no (K, C)-sized temp appears in the compiled per-device program.
    Pinned via the jaxpr: no intermediate of KTOT rows (beyond the
    sharded GLOBAL operands) is created inside the shard_map body."""
    _, _, kern, x_all = _params_and_inputs(seed=2)
    fn = _shard_map_ring(mesh_mp, kern)
    jaxpr = jax.make_jaxpr(lambda xr, xl: fn(xr, xl, *kern))(
        x_all[:NB], x_all[NB:])
    ksh = KTOT // MP

    def rows_of(aval):
        return aval.shape[0] if len(aval.shape) >= 2 else 0

    # walk the shard_map inner jaxpr: every intermediate must be local-
    # sized (token axes <= Nb + 2*Ksh covers q/k/v/concat/in-flight)
    def check(jxp):
        for eqn in jxp.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                check(sub)
            if eqn.primitive.name in ("shard_map", "pjit"):
                continue
            for var in eqn.outvars:
                shape = getattr(var.aval, "shape", ())
                # token-row axes in this program are axis 0 (tokens, C)
                # or axis 1 (H, tokens, hd)
                for ax in shape[:2]:
                    assert ax < KTOT, (
                        f"full-bank-sized temp {shape} from "
                        f"{eqn.primitive.name}")

    inner = None
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "shard_map":
            inner = eqn.params["jaxpr"]
    assert inner is not None
    check(inner)

    # same property through the BACKWARD: the custom VJP re-circulates
    # the ring instead of checkpointing the circulated shards, so the
    # grad program must be K-free per device too
    from moma_tpu.moma.queue import _grad_div

    def gbody(x_rep, x_loc):
        def loss_fn(x_rep):
            out_rep, out_loc = ring_batch_token_attention(
                x_rep, x_loc, *kern, H, "model")
            return (jnp.sum(out_rep) +
                    jax.lax.psum(jnp.sum(_grad_div(out_loc, "model")),
                                 "model"))

        return jax.grad(loss_fn)(x_rep)

    gsm = shard_map_compat(gbody, mesh_mp,
                           in_specs=(P(), P("model", None)),
                           out_specs=P())
    gjaxpr = jax.make_jaxpr(gsm)(x_all[:NB], x_all[NB:])
    inner = None
    for eqn in gjaxpr.eqns:
        if eqn.primitive.name == "shard_map":
            inner = eqn.params["jaxpr"]
    assert inner is not None
    check(inner)
