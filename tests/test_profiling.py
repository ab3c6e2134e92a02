"""Observability layer: step timer + trace capture/summarize round trip."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moma_tpu.core.profiling import StepTimer, summarize_trace, trace


def test_step_timer_ema():
    t = StepTimer(ema=0.5)
    for _ in range(3):
        t.data_start()
        time.sleep(0.005)
        t.step_start()
        time.sleep(0.01)
        out = t.step_end(batch_size=32)
    assert out["step_time"] >= 0.005
    assert out["data_time"] >= 0.001
    assert out["ips"] > 0


def test_trace_capture_and_summarize(tmp_path):
    logdir = str(tmp_path / "tr")

    @jax.jit
    def f(x):
        return jnp.sum(x @ x.T)

    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    with trace(logdir):
        for _ in range(3):
            f(x).block_until_ready()
    rows = summarize_trace(logdir)
    assert rows, "empty trace summary"
    names = [r[0] for r in rows]
    assert any("fusion" in n or "jit" in n or "dot" in n for n in names), names
