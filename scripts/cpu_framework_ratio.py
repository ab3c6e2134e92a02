"""Same-hardware framework-efficiency ratio: reference torch vs moma_tpu.

The round-1 verdict flagged bench.py's `vs_baseline` as resting on an
ASSUMED A100 number.  No GPU exists here — but both frameworks run on
this host's CPU, on the IDENTICAL MoMA step (same models, same config,
same data, same batch order; the e2e parity harness already proves the
two sides compute the same training trajectory).  Timing both on the
same silicon yields a measured framework-efficiency ratio:

    ratio = median(reference torch step time) / median(our step time)

This is NOT a TPU-vs-GPU claim.  It isolates the framework overhead
dimension (eager dispatch + python loop vs one fused jitted program) on
fixed hardware, complementing the on-chip img/s headline.

Method notes:
  - steady-state medians; the first `--warmup` steps of each side are
    dropped (jax pays compile there, torch pays allocator warmup).
  - single process at a time (this host has ONE core — see CLAUDE.md);
    the two runs are sequential, never concurrent.
  - torch thread count pinned to 1 explicitly for determinism.

Usage:
  python scripts/cpu_framework_ratio.py [--epochs 1] [--train_n 512]
         [--warmup 4] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_accuracy_parity import make_task, run_ours, run_reference  # noqa: E402


def summarize(times, warmup):
    t = np.array(times[warmup:]) * 1e3
    return {
        "steps_timed": int(t.size),
        "median_ms": float(np.median(t)),
        "p10_ms": float(np.percentile(t, 10)),
        "p90_ms": float(np.percentile(t, 90)),
        "mean_ms": float(t.mean()),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--train_n", type=int, default=512)
    p.add_argument("--warmup", type=int, default=4)
    p.add_argument("--batch", type=int, default=8,
                   help="override the harness batch size: 8 is "
                        "dispatch-dominated, 64 compute-dominated")
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    import torch

    torch.set_num_threads(1)

    import e2e_accuracy_parity as harness

    harness.B = a.batch  # module-level constant both run fns read

    train_x, train_y = make_task(a.train_n, seed=11, noise=0.6)
    val_x, val_y = make_task(64, seed=12, noise=0.6)

    ref_times: list = []
    snap, _, ref_acc = run_reference(
        train_x, train_y, val_x, val_y, a.epochs, step_times=ref_times
    )
    ours_times: list = []
    _, got_acc = run_ours(
        snap, train_x, train_y, val_x, val_y, a.epochs, step_times=ours_times
    )

    ref = summarize(ref_times, a.warmup)
    ours = summarize(ours_times, a.warmup)
    out = {
        "hardware": "same host CPU, 1 thread, sequential runs",
        "config": f"resnet8 MoMA step, B={a.batch}, K=64, mlp+self-attn heads",
        "reference_torch": ref,
        "moma_tpu_jit": ours,
        "ratio_median": ref["median_ms"] / ours["median_ms"],
        "ref_val_acc": ref_acc,
        "ours_val_acc": got_acc,
        "first_ours_step_ms_compile": float(ours_times[0] * 1e3),
    }
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f)
    return out


if __name__ == "__main__":
    main()
