"""Tracing / profiling hooks — the observability layer the reference
lacks entirely (SURVEY.md §5: only AverageMeter wall-clock).

  * StepTimer     — EMA'd step/data/host timings + images/sec
  * trace()       — context manager around jax.profiler for TensorBoard-
                    viewable device traces (XLA op timeline, HBM usage)
  * annotate()    — TraceAnnotation for host-side phases
  * memory_stats()— live per-device HBM usage
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Low-overhead step timing with EMA; call boundaries from the host
    loop.  Because dispatch is async, wall times reflect the pipeline —
    call `sync()` (blocks on a device value) at sample points for true
    device step time."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: Optional[float] = None
        self.data_time: Optional[float] = None
        self._t_last = None
        self._t_data = None

    def data_start(self):
        self._t_data = time.perf_counter()

    def step_start(self):
        now = time.perf_counter()
        if self._t_data is not None:
            d = now - self._t_data
            self.data_time = (
                d if self.data_time is None
                else self.ema * self.data_time + (1 - self.ema) * d
            )
        self._t_last = now

    def step_end(self, batch_size: int = 0) -> Dict[str, float]:
        now = time.perf_counter()
        dt = now - self._t_last if self._t_last is not None else 0.0
        self.step_time = (
            dt if self.step_time is None
            else self.ema * self.step_time + (1 - self.ema) * dt
        )
        out = {"step_time": self.step_time, "data_time": self.data_time or 0.0}
        if batch_size and self.step_time:
            out["ips"] = batch_size / self.step_time
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf:

        with profiling.trace('/tmp/trace'):
            for _ in range(10): state, m = step(state, batch, rng)
            jax.block_until_ready(m['loss'])
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def summarize_trace(logdir: str, top: int = 25) -> list:
    """Aggregate a captured trace into per-op-family device times.

    Parses the Chrome-trace JSON that jax.profiler writes
    (plugins/profile/*/ *.trace.json.gz) — no TensorBoard needed.  Returns
    [(op_family, total_ms, count)] sorted by time, device lanes only.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {logdir}")
    data = json.load(gzip.open(files[-1]))
    lanes = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in lanes.items() if n.startswith("/device:")}
    if not device_pids:  # CPU runs expose only a /host lane
        device_pids = set(lanes)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in device_pids:
            family = re.sub(r"[.\(].*$", "", e.get("name", "?"))
            if family.startswith("$"):  # python-module housekeeping lanes
                continue
            agg[family] += e["dur"]
            cnt[family] += 1
    return [
        (name, dur / 1000.0, cnt[name]) for name, dur in agg.most_common(top)
    ]


def memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            out[str(d)] = {
                "bytes_in_use_gb": s.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gb": s.get("peak_bytes_in_use", 0) / 2**30,
                "bytes_limit_gb": s.get("bytes_limit", 0) / 2**30,
            }
    return out
