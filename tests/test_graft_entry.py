"""Driver-contract hooks (__graft_entry__.py).

Round 1's only red signal was dryrun_multichip crashing in the DRIVER's
environment (one visible device — VERDICT.md item 1).  These tests pin
both hooks, including that exact failure mode: a subprocess that starts
with ONE visible device and must bootstrap its own 8-device virtual
mesh.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_lowers():
    """entry() returns a jittable fn: lowering must succeed on 1 device."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "conv" in lowered.as_text().lower()


def test_dryrun_multichip_from_one_device():
    """The driver's failure mode of round 1: dryrun_multichip(8) invoked
    in a process that sees ONE device must re-exec its own virtual mesh
    and pass."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip the pytest harness's 8-device flag: the child starts at 1
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "dryrun_multichip(8): ok" in proc.stdout
    assert "queue sharded over 'model'" in proc.stdout
