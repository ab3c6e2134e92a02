"""Probe: batch the MoMA step's TWO gradient-free teacher forwards (KL
scorer on pre-EMA params + momentum key encoder on post-EMA params,
train/moma.py step 2/4) into ONE vmapped forward over stacked weights.

Hypothesis: jax.vmap's conv batching rule merges the stack dim into the
feature dim (feature_group_count=2), so every intermediate activation
carries 2C channels — which halves XLA's lane-padding waste for all of
effiB0's C<=64 stages (C=16 -> 32, 24 -> 48, 40 -> 80; see BASELINE.md
"exotic layouts": C padded to 128 lanes).  The teacher pair is ~2 of the
step's ~4 conv passes, so a padding win here moves the headline.

Run on TPU (machine to itself — CLAUDE.md session-5 rule):
    python scripts/probe_batched_teacher.py [--steps 20]

Timing is overlapped-chained with a final value fetch (the only
trustworthy method on the axon relay).

RESULT (measured, v5e BS128@512, session 12): REFUTED — 0.489x (vmapped
166.5 ms vs sequential 81.4 ms).  jax.vmap lowers the stacked-weight
convs as feature_group_count=2 grouped convolutions, and XLA:TPU's
grouped-conv path costs ~2x the two separate dense convs — far more
than the lane-padding it merges away.  rel-L2 vs sequential ~1.5e-2
(bf16-scale: grouped lowering changes contraction order).  Kept as the
record of the negative result; do not integrate.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.cache import enable_compilation_cache
from moma_tpu.models import create_model

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=512)
    a = ap.parse_args()

    model = create_model("effiB0", num_classes=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    sample = jnp.zeros((2, a.size, a.size, 3), jnp.bfloat16)
    v = model.init(k1, sample, train=False)
    params_a = v["params"]
    # post-EMA-like second set: tiny perturbation of the first
    params_b = jax.tree_util.tree_map(
        lambda p: p * (1.0 + 1e-3), params_a)
    bs = v["batch_stats"]
    images = jax.random.uniform(
        k2, (a.batch, a.size, a.size, 3), jnp.bfloat16)
    perm = jax.random.permutation(k3, a.batch)
    images2 = images[perm]

    def fwd(p, im):
        (feats, logits), mut = model.apply(
            {"params": p, "batch_stats": bs}, im,
            train=True, mutable=["batch_stats"])
        return feats[-1], logits

    def seq_fn(im, im2):
        fa, la = fwd(params_a, im)
        fb, lb = fwd(params_b, im2)
        return fa, la, fb, lb

    stacked = jax.tree_util.tree_map(
        lambda x, y: jnp.stack([x, y]), params_a, params_b)

    def vmap_fn(im, im2):
        feats, logits = jax.vmap(fwd, in_axes=(0, 0))(
            stacked, jnp.stack([im, im2]))
        return feats[0], logits[0], feats[1], logits[1]

    # exactness check first (one call each)
    ra = jax.jit(seq_fn)(images, images2)
    rb = jax.jit(vmap_fn)(images, images2)
    for name, x, y in zip(("feat_a", "logit_a", "feat_b", "logit_b"),
                          ra, rb):
        x = np.asarray(x, np.float32)
        y = np.asarray(np.asarray(y), np.float32)
        rel = np.linalg.norm(x - y) / max(np.linalg.norm(x), 1e-9)
        print(f"rel-L2 {name}: {rel:.3e}")

    def time_chain(fn, label):
        # chain: fold a scalar of the previous output into the input so
        # the whole chain must execute before the final fetch
        @jax.jit
        def step(carry, im, im2):
            fa, la, fb, lb = fn(im + carry, im2 + carry)
            c = (jnp.sum(la) + jnp.sum(lb)).astype(jnp.bfloat16) * 0.0
            return c, jnp.sum(la)

        carry = jnp.bfloat16(0.0)
        for _ in range(a.warmup):
            carry, s = step(carry, images, images2)
        float(s)
        t0 = time.perf_counter()
        kept = []
        for _ in range(a.steps):
            carry, s = step(carry, images, images2)
            kept.append(s)
        final = float(kept[-1])
        dt = time.perf_counter() - t0
        vals = np.array([float(k) for k in kept])
        assert np.isfinite(vals).all()
        ms = dt / a.steps * 1e3
        print(f"{label}: {ms:.1f} ms / double-teacher-forward "
              f"(BS{a.batch}@{a.size})")
        return ms

    ms_seq = time_chain(seq_fn, "sequential (2 applies)")
    ms_vmap = time_chain(vmap_fn, "vmapped (stacked weights)")
    print(f"speedup: {ms_seq / ms_vmap:.3f}x")


if __name__ == "__main__":
    main()
