"""Per-op device-trace + layout-floor analysis of the exported SERVING
forward — the analyze_step.py protocol applied to the StableHLO artifact
(uint8 -> normalize -> backbone -> f32 logits, core/export.py).

Builds the artifact in MODE, dumps the compiled optimized HLO, traces
ITERS overlapped calls, prints the top device ops, and writes
`{prefix}_xla.hlo` + `{prefix}_xla_trace/` in exactly the layout
scripts/conv_ceiling.py consumes — so the same layout-feasible HBM
floors computed for the train step attach to the serving graph:

    python scripts/analyze_serving.py int8_bf16 /tmp/serv_i8b /tmp/serv_i8b
    python scripts/conv_ceiling.py /tmp/serv_i8b <iters>

Modes: f32 | bf16 | int8 | int8_bf16 | int8_dynamic | w8 | w8_bf16 (the
export CLI's precision matrix, cli/export_model.py; w8 = weights-only
int8).  Env: SERV_BS (default 128), SERV_MODEL (effiB0), SERV_IMG (512),
SERV_ITERS (20).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

MODE = sys.argv[1] if len(sys.argv) > 1 else "int8_bf16"
PREFIX = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/serv_{MODE}"
BS = int(os.environ.get("SERV_BS", "128"))
MODEL = os.environ.get("SERV_MODEL", "effiB0")
IMG = int(os.environ.get("SERV_IMG", "512"))
ITERS = int(os.environ.get("SERV_ITERS", "20"))

from moma_tpu.cli.export_model import PRECISION_MODES as MODE_FLAGS  # noqa: E402


def main():
    from moma_tpu.cli.export_model import main as export_main
    from moma_tpu.core.export import ExportedClassifier

    rs = np.random.RandomState(0)
    x = jax.device_put(
        rs.randint(0, 256, (BS, IMG, IMG, 3), np.uint8))
    jax.block_until_ready(x)

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, MODE)
        export_main(["--model", MODEL, "--n_cls", "100", "--image_size",
                     str(IMG), "--dataset", "imagenet", "--out", out]
                    + MODE_FLAGS[MODE])
        clf = ExportedClassifier(out)

        compiled = clf._call.lower(x).compile()
        hlo = compiled.as_text()
        hlo_path = f"{PREFIX}_xla.hlo"
        with open(hlo_path, "w") as f:
            f.write(hlo)
        print(f"HLO: {hlo_path} ({len(hlo) / 1e6:.1f} MB)", flush=True)

        # warmup, then one overlapped traced chain (CLAUDE.md timing rules:
        # device-resident input, ONE final value fetch forcing the chain)
        acc = None
        for _ in range(3):
            acc = jnp.max(clf(x))
        _ = float(acc)
        trace_dir = f"{PREFIX}_xla_trace"
        jax.profiler.start_trace(trace_dir)
        acc = None
        for _ in range(ITERS):
            m = jnp.max(clf(x))
            acc = m if acc is None else jnp.maximum(acc, m)
        val = float(acc)
        jax.profiler.stop_trace()
        assert np.isfinite(val)

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    lanes = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in lanes.items() if n.startswith("/device:")}
    agg, cnt = collections.Counter(), collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in device_pids:
            name = e.get("name", "?")
            # skip sugar names and the MODULE-level span ("jit_call(...)"),
            # which CONTAINS every op span — counting it doubles the total
            # (observed: 60.26 ms "total" = exactly 2x the real 30.13)
            if name.startswith("$") or name.startswith("jit_"):
                continue
            agg[name] += e["dur"]
            cnt[name] += 1
    total = sum(agg.values()) / 1000 / ITERS
    print(f"\n{MODE} {MODEL}@{IMG} BS{BS}: total device {total:.2f} ms/call "
          f"= {BS / total * 1000:.1f} img/s device rate; top ops:",
          flush=True)

    hlo_lines = {}
    for line in hlo.splitlines():
        mm = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if mm:
            hlo_lines[mm.group(1)] = line.strip()

    def op_summary(name):
        line = hlo_lines.get(name) or hlo_lines.get(name.replace("%", ""))
        if not line:
            return "(hlo def not found)"
        shapes = re.findall(r"(?:bf16|f32|f16|s32|s8|u8|u32|pred)\[[\d,]*\]",
                            line)
        kind = re.search(r"= \S+ (\w+)", line)
        return (kind.group(1) if kind else "?") + " " + " ".join(shapes[:8])

    for name, dur in agg.most_common(24):
        print(f"  {dur / 1000 / ITERS:7.3f} ms  x{cnt[name] // ITERS:3d}  "
              f"{name:44s} {op_summary(name)[:130]}", flush=True)
    print(f"\nnow run: python scripts/conv_ceiling.py {PREFIX} {ITERS}",
          flush=True)


if __name__ == "__main__":
    main()
