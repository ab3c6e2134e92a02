"""CRD — Contrastive Representation Distillation (functional).

Re-design of the reference's crd/ package: `ContrastMemory`'s in-place
dual banks + lazy normalization constants (crd/memory.py:6-79) become an
explicit CRDMemory pytree threaded through the jitted step, and
`ContrastLoss` Eq(18) (crd/criterion.py:49-74) is a pure function.

Negative-index sampling stays host-side (the class-aware instance sampler,
moma_tpu/data/sampler.py) exactly as the reference keeps it in the
Dataset; uniform alias-sampling is a degenerate case of the same batch
input (contrast_idx column 0 = the sample's own index).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

EPS = 1e-7


class CRDMemory(struct.PyTreeNode):
    """Dual memory banks + lazy Z constants (reference params[2:4])."""

    v1: jax.Array  # (n_data, feat_dim) student-side bank
    v2: jax.Array  # (n_data, feat_dim) teacher-side bank
    z_v1: jax.Array  # scalar, -1 until first batch
    z_v2: jax.Array

    @classmethod
    def create(cls, rng: jax.Array, n_data: int, feat_dim: int) -> "CRDMemory":
        stdv = 1.0 / math.sqrt(feat_dim / 3)
        k1, k2 = jax.random.split(rng)
        v1 = jax.random.uniform(k1, (n_data, feat_dim), jnp.float32, -stdv, stdv)
        v2 = jax.random.uniform(k2, (n_data, feat_dim), jnp.float32, -stdv, stdv)
        return cls(
            v1=v1, v2=v2,
            z_v1=jnp.asarray(-1.0, jnp.float32),
            z_v2=jnp.asarray(-1.0, jnp.float32),
        )


def contrast_scores(
    mem: CRDMemory,
    f_s: jax.Array,            # (B, D) embedded+normalized student
    f_t: jax.Array,            # (B, D) embedded+normalized teacher
    idx: jax.Array,            # (B,) dataset indices of the batch
    contrast_idx: jax.Array,   # (B, K+1); column 0 == idx
    nce_t: float,
    momentum: float,
) -> Tuple[jax.Array, jax.Array, CRDMemory]:
    """Returns (out_v1, out_v2, new_mem) with reference ordering: scores
    from the PRE-update banks, then momentum update of rows `idx`
    (crd/memory.py:33-77)."""
    n_data = mem.v1.shape[0]
    B, Kp1 = contrast_idx.shape

    w_v1 = jax.lax.stop_gradient(mem.v1)[contrast_idx]  # (B, K+1, D)
    w_v2 = jax.lax.stop_gradient(mem.v2)[contrast_idx]
    out_v2 = jnp.exp(jnp.einsum("bkd,bd->bk", w_v1, f_t) / nce_t)
    out_v1 = jnp.exp(jnp.einsum("bkd,bd->bk", w_v2, f_s) / nce_t)

    # lazy Z: first batch sets it, afterwards constant (params[2:4])
    z_v1 = jnp.where(
        mem.z_v1 < 0, jax.lax.stop_gradient(jnp.mean(out_v1)) * n_data, mem.z_v1
    )
    z_v2 = jnp.where(
        mem.z_v2 < 0, jax.lax.stop_gradient(jnp.mean(out_v2)) * n_data, mem.z_v2
    )
    out_v1 = out_v1 / z_v1
    out_v2 = out_v2 / z_v2

    def bank_update(bank, v):
        rows = bank[idx] * momentum + jax.lax.stop_gradient(v) * (1 - momentum)
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        return bank.at[idx].set(rows)

    new_mem = mem.replace(
        v1=bank_update(mem.v1, f_s),
        v2=bank_update(mem.v2, f_t),
        z_v1=z_v1,
        z_v2=z_v2,
    )
    return out_v1, out_v2, new_mem


def contrast_loss(x: jax.Array, n_data: int) -> jax.Array:
    """Eq (18) NCE loss (crd/criterion.py:49-74): column 0 is the positive."""
    B, m1 = x.shape
    m = m1 - 1
    Pn = 1.0 / n_data
    p_pos = x[:, 0]
    log_d1 = jnp.log(p_pos / (p_pos + m * Pn + EPS))
    p_neg = x[:, 1:]
    log_d0 = jnp.log((m * Pn) / (p_neg + m * Pn + EPS))
    return -(jnp.sum(log_d1) + jnp.sum(log_d0)) / B


def crd_loss(
    mem: CRDMemory,
    f_s: jax.Array,
    f_t: jax.Array,
    idx: jax.Array,
    contrast_idx: jax.Array,
    nce_t: float = 0.07,
    momentum: float = 0.5,
) -> Tuple[jax.Array, CRDMemory]:
    """Full CRD step loss (crd/criterion.py:30-46): symmetric s/t NCE."""
    n_data = mem.v1.shape[0]
    out_v1, out_v2, new_mem = contrast_scores(
        mem, f_s, f_t, idx, contrast_idx, nce_t, momentum
    )
    return contrast_loss(out_v1, n_data) + contrast_loss(out_v2, n_data), new_mem
