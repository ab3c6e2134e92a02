"""TPU compiler-option injection for the jitted training/eval steps.

XLA:TPU's scoped-VMEM budget (the per-op scratch the fusion sizer may
assume) defaults to ~16 MB of the v5e's 128 MB VMEM.  The MoMA full step
is bandwidth-bound in its convolutions (BASELINE.md: 70% of the step at
1.48x a pure-streaming floor), and deeper fusion tiles amortize more HBM
traffic — raising the budget is a measured, pure-scheduling win on the
flagship config (effiB0@512 BS128 MoMA step, overlapped timing, idle
machine):

    scoped_vmem_kib   img/s/chip
    default (~16 MB)  501.1
    32768             534.0
    49152             537.1
    65536             538.7   <- default here (+7.5%)
    98304             528.0   (budget crowds out double-buffering)

The env knob cannot carry this (the axon client's XLA_FLAGS parser is a
CPU build and rejects TPU backend flags); jax.jit(compiler_options=...)
reaches the remote TPU compile service, so the step builders route their
jits through `jit()` below.  On CPU backends (tests' virtual mesh) the
option is never injected — it is a TPU-only flag.  `--scoped_vmem_kib 0`
restores the XLA default.
"""

from __future__ import annotations

import jax

# the tuned value (single source of truth — RunConfig and the CLI flag
# default import it)
DEFAULT_SCOPED_VMEM_KIB = 65536
_scoped_vmem_kib = DEFAULT_SCOPED_VMEM_KIB


def set_scoped_vmem(kib: int | None) -> None:
    """Set the scoped-VMEM budget for subsequently-built steps.
    0 = XLA default; None = restore this module's tuned default."""
    global _scoped_vmem_kib
    _scoped_vmem_kib = DEFAULT_SCOPED_VMEM_KIB if kib is None else int(kib)


def current_compiler_options() -> dict | None:
    """The options `jit` would inject right now (None off-TPU / disabled)."""
    if _scoped_vmem_kib <= 0:
        return None
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform == "cpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(_scoped_vmem_kib)}


def jit(fn, **kw):
    """jax.jit that injects the tuned TPU compiler options (explicit
    compiler_options passed by the caller win on key conflicts)."""
    opts = current_compiler_options()
    if opts:
        merged = dict(opts)
        merged.update(kw.pop("compiler_options", None) or {})
        kw["compiler_options"] = merged
    return jax.jit(fn, **kw)
