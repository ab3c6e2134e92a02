"""Conv bandwidth-ceiling analysis: measured per-op time vs the
layout-feasible HBM minimum (VERDICT round-2 task 4 'prove the ceiling').

Inputs: the optimized HLO + device trace that scripts/analyze_step.py
writes (run that first on TPU).  For every timed fusion this script

  * parses the op's output AND operand shapes WITH their physical
    layouts (minor-to-major order + T(a,b) tiling) straight from the
    HLO — no layout guessing: padded bytes are computed from the real
    tile paddings XLA chose,
  * computes bytes_padded (what the op must move through HBM given the
    layouts) and bytes_ideal (densely packed, no tile padding),
  * derives min_ms = bytes_padded / HBM_BW and ratio = measured/min.

Aggregated per family and per EfficientNet stage, this either exposes
ops far above their bandwidth floor (optimization targets) or proves the
step is at the layout-feasible ceiling.

Usage: python scripts/conv_ceiling.py [prefix=/tmp/r2_step] [iters=10]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys

HBM_BW = 819e9  # bytes/s, TPU v5e
MXU_BF16 = 197e12  # flop/s peak
ITEMSIZE = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
            "s8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}

_SHAPE_RE = re.compile(
    r"(\w+)\[([\d,]*)\](?:\{([\d,]+)(?::T\(([\dx,()]+)\))?[^}]*\})?"
)


def parse_shape(tok: str):
    """-> (dtype, dims, minor_to_major, tile) or None."""
    m = _SHAPE_RE.match(tok)
    if not m or m.group(1) not in ITEMSIZE:
        return None
    dt = m.group(1)
    dims = [int(x) for x in m.group(2).split(",") if x] or [1]
    mtm = ([int(x) for x in m.group(3).split(",")]
           if m.group(3) else list(range(len(dims) - 1, -1, -1)))
    tile = m.group(4) or ""
    return dt, dims, mtm, tile


def padded_bytes(dt, dims, mtm, tile):
    """Physical bytes under the HLO layout: pad the two minor physical
    dims to the T(a,b) tile (bf16 packs (2,1): effective second-minor
    tile doubles)."""
    size = ITEMSIZE[dt]
    dims = list(dims)
    # tile text like '8,128)(2,1' (regex captured past the first paren):
    # the FIRST pair is the physical tile; later groups are sub-packing
    tm = re.match(r"(\d+),(\d+)", tile.split(")")[0])
    if tm and len(dims) >= 1:
        a, b = int(tm.group(1)), int(tm.group(2))
        if dt in ("bf16", "f16"):
            a *= 2  # (2,1) sub-tiling packs 2 sublanes per word
        minor = mtm[0]
        dims[minor] = -(-dims[minor] // b) * b
        if len(dims) >= 2:
            second = mtm[1]
            dims[second] = -(-dims[second] // a) * a
    n = 1
    for d in dims:
        n *= d
    return n * size


def ideal_bytes(dt, dims):
    n = 1
    for d in dims:
        n *= d
    return n * ITEMSIZE[dt]


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2_step"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    hlo = open(f"{prefix}_xla.hlo").read()
    # name -> (def line)
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = ", line)
        if m:
            defs[m.group(1)] = line.strip()

    def op_shapes(name):
        """(output shapes, operand shapes) with layouts, from the def."""
        line = defs.get(name)
        if not line:
            return [], []
        lhs, rhs = line.split(" = ", 1)
        # outputs: first shape token(s) before the opcode
        out_part = rhs.split("(", 1)[0] if rhs.startswith("(") is False else ""
        # robust: outputs = shapes before ' fusion(' / ' <opcode>('
        mm = re.match(r"(\(.*?\)|\S+) (\w[\w\-.]*)\(", rhs)
        outs, opnds = [], []
        if mm:
            for tok in re.findall(_SHAPE_RE, mm.group(1)):
                if tok[0] in ITEMSIZE:
                    outs.append(parse_shape(
                        f"{tok[0]}[{tok[1]}]"
                        + (f"{{{tok[2]}:T({tok[3]})}}" if tok[2] else "")
                    ))
            args = rhs[mm.end():]
            for an in re.findall(r"%([\w.\-]+)", args.split(", calls=")[0]):
                d = defs.get(an)
                if not d:
                    continue
                dm = re.search(r"= (\(?[\w\[\],{}:().\d]+)", d)
                if dm:
                    s = parse_shape(dm.group(1).lstrip("("))
                    if s:
                        opnds.append(s)
        return [o for o in outs if o], opnds

    files = sorted(glob.glob(f"{prefix}_xla_trace/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    lanes = {e["pid"]: e["args"].get("name", "")
             for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in lanes.items() if n.startswith("/device:")}
    agg = collections.Counter()
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and e.get("dur")
                and e.get("pid") in device_pids):
            name = e.get("name", "?")
            if name.startswith("$") or name.startswith("jit_") or name.isdigit():
                continue
            agg[name] += e["dur"]

    def conv_flops_ms(outs, opnds, name):
        """MXU-floor estimate for conv fusions: find the kernel operand
        (4-D, both spatial dims <= 7 or 1x1, < 8 MB) and the conv output
        (the largest 4-D output); MACs = out_elems * kh*kw*cin."""
        if "reduce_fusion" not in name and "add_fusion" not in name:
            return 0.0
        kern = None
        for dt, dims, mtm, tile in opnds + outs:
            if (len(dims) == 4 and dims[0] <= 7 and dims[1] <= 7
                    and ideal_bytes(dt, dims) < 8e6
                    and dims[2] * dims[3] > 16):
                if kern is None or ideal_bytes(dt, dims) > ideal_bytes(
                        kern[0], kern[1]):
                    kern = (dt, dims)
        big = None
        for dt, dims, mtm, tile in outs + opnds:
            if len(dims) == 4 and dims[0] > 7:
                if big is None or ideal_bytes(dt, dims) > ideal_bytes(
                        big[0], big[1]):
                    big = (dt, dims)
        if kern is None or big is None:
            return 0.0
        kh, kw, ci, co = kern[1]
        n, d1, d2, d3 = big[1]
        # output spatial elems: use the big tensor's non-channel dims
        spatial = d1 * d2 if d3 in (ci, co) else d2 * d3
        macs = n * spatial * co * kh * kw * ci
        return 2.0 * macs / MXU_BF16 * 1000

    rows = []
    for name, dur_us in agg.items():
        ms = dur_us / 1000 / iters
        if ms < 0.05:
            continue
        outs, opnds = op_shapes(name)
        if not outs and not opnds:
            rows.append((ms, name, None, None, None))
            continue
        bp = sum(padded_bytes(*s) for s in outs + opnds)
        bi = sum(ideal_bytes(s[0], s[1]) for s in outs + opnds)
        min_ms = max(bp / HBM_BW * 1000, conv_flops_ms(outs, opnds, name))
        rows.append((ms, name, bp, bi, min_ms))

    rows.sort(reverse=True)
    print(f"{'ms':>8} {'minBW ms':>9} {'x floor':>8} {'padded MB':>10} "
          f"{'pad/ideal':>9}  op")
    tot_ms = tot_min = 0.0
    fam_ms = collections.Counter()
    fam_min = collections.defaultdict(float)
    for ms, name, bp, bi, min_ms in rows[:40]:
        if bp is None:
            print(f"{ms:8.2f} {'?':>9} {'?':>8} {'?':>10} {'?':>9}  {name}")
            continue
        print(f"{ms:8.2f} {min_ms:9.2f} {ms/max(min_ms,1e-6):8.2f} "
              f"{bp/1e6:10.1f} {bp/max(bi,1):9.2f}  {name[:60]}")
    for ms, name, bp, bi, min_ms in rows:
        base = re.sub(r"\.\d+$", "", name)
        fam_ms[base] += ms
        if min_ms:
            fam_min[base] += min_ms
            tot_ms += ms
            tot_min += min_ms
    print("\nper family (attributed ops only):")
    for base, ms in fam_ms.most_common(12):
        mn = fam_min.get(base, 0.0)
        r = f"{ms/mn:6.2f}x floor" if mn else "  n/a"
        print(f"  {ms:8.2f} ms  min {mn:8.2f} ms  {r}  {base}")
    print(f"\nTOTAL attributed: measured {tot_ms:.1f} ms vs layout-feasible "
          f"HBM floor {tot_min:.1f} ms -> {tot_ms/max(tot_min,1e-6):.2f}x")


if __name__ == "__main__":
    main()
