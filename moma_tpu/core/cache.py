"""Persistent XLA compilation cache setup.

effiB0@512 MoMA steps are large XLA programs (student fwd+bwd + two
teacher forwards + on-device RandAugment); cold compiles run minutes on
the remote-compile path.  A persistent cache makes every process after
the first start in seconds.  Call `enable_compilation_cache()` before the
first jit execution (all CLIs, bench.py and __graft_entry__ do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    # CPU runs (tests, the driver's dryrun) must NOT share the cache:
    # persisted CPU AOT entries carry the COMPILING machine's features,
    # and entries written on another host (rounds run on a fleet) can
    # SIGILL on reload — observed as a dead executor thread leaving the
    # other virtual devices stuck in an AllGather until the
    # AwaitAndLogIfStuck check-failure aborts the process.  The env var
    # alone is NOT the platform on this box (a site hook pins
    # JAX_PLATFORMS=axon; CPU is selected via jax.config.update after
    # import), so check the live config first.
    platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
        "JAX_PLATFORMS", "")
    if str(platforms).startswith("cpu"):
        return ""

    path = path or os.environ.get(
        "MOMA_TPU_XLA_CACHE", os.path.expanduser("~/.cache/moma_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
