"""Stem-layout probe (VERDICT r3 next #8): space-to-depth folded stem.

The conv wall is trace-proven at 1.25x its layout-feasible floor ON
XLA'S CHOSEN LAYOUTS; the stem conv's operands sit in small-C layouts
(C=3 input, C=32 output -> batch-minor {0,3,2,1}).  A space-to-depth
packed stem (512^2x3 -> 256^2x12 @s2d=2 or 128^2x48 -> 128^2x128
@s2d=4, with the original 3x3 s2 kernel folded exactly into a 2x2 s1
conv — models/efficientnet.py:_StemConv) changes the layouts that
floor is conditioned on.  Expectation is low (BASELINE.md batch-minor
N=128 lore says BS128 already removes the N-padding); deliverable is
one measured in-step delta or a recorded negative, nothing more.

Timing: the bench.py overlapped chain (one final value fetch) on the
FULL canonical MoMA step, interleaved A/B/A to split drift from signal.

  python scripts/probe_stem_s2d.py [--steps 15] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=4)
    p.add_argument("--json", type=str, default="")
    a = p.parse_args(argv)

    from moma_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench

    out = {}
    # A/B/A: baseline, s2d=2, s2d=4, baseline re-run (drift check)
    for tag, s2d in (("base", 0), ("s2d2", 2), ("s2d4", 4), ("base2", 0)):
        ips = bench.bench_moma_histo(batch_size=128, steps=a.steps,
                                     warmup=a.warmup, stem_s2d=s2d)
        out[tag] = round(ips, 1)
        print(f"[probe_stem_s2d] {tag} (stem_s2d={s2d}): {ips:.1f} "
              f"img/s/chip", flush=True)
    base = (out["base"] + out["base2"]) / 2
    out["delta_s2d2_pct"] = round(100 * (out["s2d2"] / base - 1), 2)
    out["delta_s2d4_pct"] = round(100 * (out["s2d4"] / base - 1), 2)
    print(json.dumps(out, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
