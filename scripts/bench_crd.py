"""CRD contrast machinery micro-bench at the config-#3 shape
(B=512, K=16384, D=128, n_data=50000).

Round-1 measured the CRD student at 6.6k img/s/chip (77 ms/step) vs
54.6k for vanilla KD — the gap is the (B,K+1,D) bank row-gathers:
8.6 GB materialized + re-read per step.  This bench isolates
contrast_scores+loss+bank-update (with grads wrt f_s/f_t, as in
training) and compares formulations:

  gather   — current: w = bank[idx] rows, einsum bkd,bd->bk
  allmm    — score EVERYTHING on the MXU: s = f @ bank.T (B,n_data),
             then select (B,K+1) scalars with take_along_axis
  gather16 — row-gather with bf16 banks (halves traffic; scores exact
             to bf16 rounding of the bank values)

Timing: overlapped chain of N dependent steps, one final value fetch.
Usage: python scripts/bench_crd.py [N=10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from moma_tpu.core.cache import enable_compilation_cache
from moma_tpu.losses.crd import CRDMemory, contrast_loss, contrast_scores

B, K, D, N_DATA = 512, 16384, 128, 50000
NCE_T, MOM = 0.07, 0.5


def scores_allmm(mem, f_s, f_t, idx, contrast_idx):
    n_data = mem.v1.shape[0]
    s1 = jnp.einsum("bd,nd->bn", f_t, jax.lax.stop_gradient(mem.v1))
    s2 = jnp.einsum("bd,nd->bn", f_s, jax.lax.stop_gradient(mem.v2))
    out_v2 = jnp.exp(jnp.take_along_axis(s1, contrast_idx, axis=1) / NCE_T)
    out_v1 = jnp.exp(jnp.take_along_axis(s2, contrast_idx, axis=1) / NCE_T)
    z_v1 = jnp.where(mem.z_v1 < 0,
                     jax.lax.stop_gradient(jnp.mean(out_v1)) * n_data,
                     mem.z_v1)
    z_v2 = jnp.where(mem.z_v2 < 0,
                     jax.lax.stop_gradient(jnp.mean(out_v2)) * n_data,
                     mem.z_v2)
    out_v1, out_v2 = out_v1 / z_v1, out_v2 / z_v2

    def bank_update(bank, v):
        rows = bank[idx] * MOM + jax.lax.stop_gradient(v) * (1 - MOM)
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        return bank.at[idx].set(rows)

    new_mem = mem.replace(v1=bank_update(mem.v1, f_s),
                          v2=bank_update(mem.v2, f_t),
                          z_v1=z_v1, z_v2=z_v2)
    return out_v1, out_v2, new_mem


def make_step(scores_fn):
    def loss_fn(f_s, f_t, mem, idx, cidx):
        o1, o2, new_mem = scores_fn(mem, f_s, f_t, idx, cidx)
        return (contrast_loss(o1, N_DATA) + contrast_loss(o2, N_DATA),
                new_mem)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    from functools import partial

    @partial(jax.jit, static_argnums=(4,))
    def chain(f0, mem, idx, cidx, n):
        def body(carry, _):
            f, mem = carry
            (l, mem), (g_s, g_t) = grad_fn(f, f * 0.5 + 0.1, mem, idx, cidx)
            f = f - 0.01 * (g_s + g_t)  # keep steps dependent
            return (f, mem), l

        (f, mem), losses = jax.lax.scan(body, (f0, mem), None, length=n)
        return losses[-1], losses

    return chain


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    mem = CRDMemory.create(k1, N_DATA, D)
    f0 = jax.random.normal(k2, (B, D))
    f0 = f0 / jnp.linalg.norm(f0, axis=1, keepdims=True)
    idx = jax.random.randint(k3, (B,), 0, N_DATA)
    cidx = jax.random.randint(jax.random.PRNGKey(7), (B, K + 1), 0, N_DATA)
    cidx = cidx.at[:, 0].set(idx)
    mem, f0, idx, cidx = jax.device_put((mem, f0, idx, cidx))
    jax.block_until_ready((mem, f0))

    def gather16(mem, f_s, f_t, idx, cidx):
        m16 = mem.replace(v1=mem.v1.astype(jnp.bfloat16),
                          v2=mem.v2.astype(jnp.bfloat16))
        o1, o2, nm = contrast_scores(m16, f_s.astype(jnp.bfloat16),
                                     f_t.astype(jnp.bfloat16), idx, cidx,
                                     NCE_T, MOM)
        return (o1.astype(jnp.float32), o2.astype(jnp.float32),
                nm.replace(v1=nm.v1.astype(jnp.float32),
                           v2=nm.v2.astype(jnp.float32)))

    variants = {
        "gather": lambda m, fs, ft, i, c: contrast_scores(
            m, fs, ft, i, c, NCE_T, MOM),
        "allmm": scores_allmm,
        "gather16": gather16,
    }
    ref = None
    for name, fn in variants.items():
        chain = make_step(fn)
        final, losses = chain(f0, mem, idx, cidx, n_steps)
        float(final)  # warm + force
        t0 = time.perf_counter()
        final, losses = chain(f0, mem, idx, cidx, n_steps)
        v = float(final)
        dt = (time.perf_counter() - t0) / n_steps * 1000
        l0 = float(losses[0])
        if ref is None:
            ref = l0
        print(f"{name:>9}: {dt:7.2f} ms/step  (loss[0]={l0:.6f} "
              f"drift={abs(l0 - ref):.2e}, final={v:.4f}) -> "
              f"{B / dt * 1000:.0f} img/s equiv")


if __name__ == "__main__":
    main()
