"""Round-5 TPU measurement queue — resumable, one item at a time.

Runs the round's on-chip measurements back-to-back after the flagship
accuracy study finishes, flushing each result to .bench/ the moment it
lands (the axon relay dies for hours without warning — a mid-run death
must cost only the in-flight item).  Items whose JSON already exists are
skipped on re-run.

Timing items need the machine to themselves (CLAUDE.md: a CPU-starved
relay thread turned 492 img/s into a measured 25): the runner SIGSTOPs
the process tree named in --pause_pidfile (the CPU-bound CRD floor
study) around them and SIGCONTs it after.

  timeout 14000 python scripts/r5_queue.py \
      [--wait_json .bench/flagship_r5.json --wait_pid <pid>] \
      [--pause_pidfile /tmp/r5_crd.pid] [--skip lifecycle,...]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH = os.path.join(REPO, ".bench")


def _tree_pids(root: int) -> list[int]:
    """root + descendants via /proc (no pattern matching)."""
    pids, todo = [], [root]
    while todo:
        p = todo.pop()
        if not os.path.exists(f"/proc/{p}"):
            continue
        pids.append(p)
        try:
            for tid in os.listdir(f"/proc/{p}/task"):
                with open(f"/proc/{p}/task/{tid}/children") as f:
                    todo += [int(c) for c in f.read().split()]
        except OSError:
            pass
    return pids


class Paused:
    def __init__(self, pidfile: str | None):
        self.pids = []
        if pidfile and os.path.exists(pidfile):
            with open(pidfile) as f:
                root = int(f.read().strip())
            self.pids = _tree_pids(root)

    def __enter__(self):
        for p in self.pids:
            try:
                os.kill(p, signal.SIGSTOP)
            except ProcessLookupError:
                pass
        if self.pids:
            print(f"[queue] paused {self.pids}", flush=True)
        return self

    def __exit__(self, *a):
        for p in reversed(self.pids):
            try:
                os.kill(p, signal.SIGCONT)
            except ProcessLookupError:
                pass
        if self.pids:
            print(f"[queue] resumed {self.pids}", flush=True)


def run_item(name: str, cmd: list[str], out_json: str, timeout_s: int):
    if os.path.exists(out_json):
        print(f"[queue] {name}: already recorded, skipping", flush=True)
        return
    print(f"[queue] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=REPO, timeout=timeout_s,
                           capture_output=True, text=True)
        rc = r.returncode
        tail = (r.stdout + r.stderr)[-4000:]
    except subprocess.TimeoutExpired as e:
        rc, tail = -1, f"TIMEOUT after {timeout_s}s: " + str(
            (e.stdout or b"")[-2000:])
    dt = round(time.time() - t0, 1)
    print(f"[queue] {name}: rc={rc} in {dt}s", flush=True)
    if rc != 0 and not os.path.exists(out_json):
        # record the failure as data (VERDICT r4 weak #4)
        with open(out_json, "w") as f:
            json.dump({"item": name, "rc": rc, "wall_s": dt,
                       "FAILED": True, "tail": tail}, f, indent=2)
    elif rc == 0 and not os.path.exists(out_json):
        with open(out_json, "w") as f:
            json.dump({"item": name, "rc": 0, "wall_s": dt,
                       "stdout_tail": tail}, f, indent=2)


SCALEDK_SNIPPET = """
import json, sys
sys.path.insert(0, {repo!r})
from moma_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
import bench
out = {{}}
out['attn_all_16640'] = round(bench.bench_moma_histo(
    batch_size=128, mem='MoCoAtt', attn='all', steps=10, warmup=3), 1)
out['attn_all_k65536'] = round(bench.bench_moma_histo(
    batch_size=128, mem='MoCoAtt', attn='all', nce_k=65536,
    steps=8, warmup=3), 1)
out['attn_all_k131072'] = round(bench.bench_moma_histo(
    batch_size=128, mem='MoCoAtt', attn='all', nce_k=131072,
    steps=6, warmup=2), 1)
with open({out!r}, 'w') as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wait_json", type=str, default="")
    p.add_argument("--wait_pid", type=int, default=0)
    p.add_argument("--pause_pidfile", type=str, default="")
    p.add_argument("--skip", type=str, default="")
    a = p.parse_args(argv)
    skip = set(a.skip.split(",")) if a.skip else set()
    os.makedirs(BENCH, exist_ok=True)

    # wait for the flagship study (json written OR its process gone)
    if a.wait_json:
        while not os.path.exists(a.wait_json):
            if a.wait_pid and not os.path.exists(f"/proc/{a.wait_pid}"):
                print("[queue] wait: process gone without json "
                      "(crashed or timed out) — proceeding", flush=True)
                break
            time.sleep(30)
        print("[queue] flagship wait done", flush=True)

    py = sys.executable

    # 1. canonical lifecycle (accuracy/workflow — CRD may keep running)
    if "lifecycle" not in skip:
        run_item("lifecycle",
                 [py, "scripts/canonical_lifecycle.py",
                  "--json", ".bench/lifecycle_r5.json"],
                 os.path.join(BENCH, "lifecycle_r5.json"), 7000)

    # timing block: machine to ourselves
    with Paused(a.pause_pidfile or None):
        if "headline" not in skip:
            run_item("headline", [py, "bench.py", "--tq"],
                     os.path.join(BENCH, "r5_headline.json"), 3600)
        if "scaledk" not in skip:
            run_item("scaledk",
                     [py, "-c", SCALEDK_SNIPPET.format(
                         repo=REPO,
                         out=os.path.join(BENCH, "r5_scaledk.json"))],
                     os.path.join(BENCH, "r5_scaledk.json"), 5000)
        if "flash_bigN" not in skip:
            run_item("flash_bigN",
                     [py, "scripts/tune_flash_bigN.py",
                      "--json", ".bench/r5_flash_bigN.json"],
                     os.path.join(BENCH, "r5_flash_bigN.json"), 5000)
        if "stem" not in skip:
            run_item("stem",
                     [py, "scripts/probe_stem_s2d.py",
                      "--json", ".bench/r5_stem.json"],
                     os.path.join(BENCH, "r5_stem.json"), 5000)

    print("[queue] all items done", flush=True)


if __name__ == "__main__":
    main()
