"""Serving-throughput benchmark: f32 vs bf16 vs int8 exported artifacts.

Measures the effiB0@512 eval forward through the FULL serving path the
export CLI produces (uint8 -> normalize -> backbone -> f32 logits,
StableHLO artifact reloaded via ExportedClassifier), for the precision
modes (cli/export_model.py PRECISION_MODES):

  f32          plain export
  bf16         --bf16 (bf16 compute baked at export, logits f32)
  int8         --int8 (PTQ: per-tensor act / per-channel weight scales,
               int8 x int8 -> int32 convs on the MXU, fp epilogue)
  int8_bf16    --int8 --bf16
  w8 / w8_bf16 --int8_weights [--bf16] (weights-only: int8 kernels
               dequantized in-graph, activations untouched)

Protocol (CLAUDE.md timing rules): inputs device-resident (a host-push
per call measures the 25 MB/s axon tunnel, not the chip); N timed
overlapped iterations chained through jnp.max(logits) fetched ONCE at
the end (a fetched value cannot be faked); warmup excluded.  One
process, all modes — the compilation cache makes reruns cheap.

Usage:
  python scripts/bench_serving.py [--model effiB0] [--image_size 512]
      [--bs 128] [--iters 30] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.cache import enable_compilation_cache


def measure(clf, x_dev, iters: int) -> float:
    """Overlapped img/s: chain iters calls, fetch one scalar at the end."""
    # warmup / compile
    jax.block_until_ready(clf(x_dev))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        logits = clf(x_dev)
        # cheap device-side reduction keeps the chain on device; the
        # final float() forces every link
        acc = jnp.max(logits) if acc is None else jnp.maximum(
            acc, jnp.max(logits))
    val = float(acc)
    dt = time.perf_counter() - t0
    assert np.isfinite(val)
    return iters * x_dev.shape[0] / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="effiB0")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--modes", default="f32,bf16,int8")
    p.add_argument("--json", default=None)
    a = p.parse_args(argv)

    enable_compilation_cache()
    from moma_tpu.cli.export_model import main as export_main
    from moma_tpu.core.export import ExportedClassifier

    rs = np.random.RandomState(0)
    x = rs.randint(0, 256, (a.bs, a.image_size, a.image_size, 3), np.uint8)
    x_dev = jax.device_put(x)
    jax.block_until_ready(x_dev)

    results = {}
    with tempfile.TemporaryDirectory() as td:
        from moma_tpu.cli.export_model import PRECISION_MODES

        for mode in a.modes.split(","):
            out = os.path.join(td, mode)
            args = ["--model", a.model, "--n_cls", "100",
                    "--image_size", str(a.image_size), "--dataset",
                    "imagenet", "--out", out] + PRECISION_MODES[mode]
            try:
                export_main(args)
                clf = ExportedClassifier(out)
                rate = measure(clf, x_dev, a.iters)
            except Exception as e:  # e.g. backend rejects int8 convs
                print(f"{mode}: FAILED — {type(e).__name__}: "
                      f"{str(e)[:300]}")
                results[mode] = None
                continue
            results[mode] = round(rate, 1)
            print(f"{mode}: {rate:.1f} img/s/chip, "
                  f"{1000.0 * a.bs / rate:.2f} ms/call "
                  f"(BS{a.bs} @ {a.image_size}, {a.iters} overlapped iters, "
                  f"artifact {os.path.getsize(out + '.stablehlo') / 1e6:.1f} MB)")

    if results.get("f32"):
        for m, r in results.items():
            if r:
                print(f"  {m}: {r / results['f32']:.2f}x over f32")
    if a.json:
        with open(a.json, "w") as f:
            json.dump({"model": a.model, "image_size": a.image_size,
                       "bs": a.bs, "img_per_s": results}, f, indent=2)
    return results


if __name__ == "__main__":
    main()
