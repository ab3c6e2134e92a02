"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed runtime
(`learning/base_trainer.py:21-61` — NCCL process groups + mp.spawn, one
process per GPU).  Here the whole host sees every local chip through a
single `jax.sharding.Mesh`; gradient/metric reduction happens via XLA
collectives inserted by `jit` from sharding annotations, not via an
explicit DDP wrapper.

The default mesh is 2-D `('data', 'model')` with model=1: pure data
parallelism, matching the reference's DDP capability, but the model axis is
real — large projection heads / the MoCo negative queue can be sharded over
it when scaling up (see moma_tpu/moma/queue.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (the mp.spawn/NCCL-rendezvous replacement,
    reference base_trainer.py:39-61).  On TPU pods jax.distributed
    auto-discovers everything; args exist for manual DCN setups (and the
    2-process CPU smoke, tests/test_multihost_smoke.py — gloo backs the
    cross-process collectives there).

    Explicit args are a hard requirement: failures RAISE.  Only the
    zero-arg autodetect call degrades to single-process silently."""
    import jax

    explicit = coordinator is not None or num_processes is not None
    # NOTE: must not touch the backend before initialize() (jax.devices/
    # default_backend would initialize XLA) — read the config value only
    platforms = str(getattr(jax.config, "jax_platforms", None) or "")
    if explicit and ("cpu" in platforms or not platforms):
        # Cross-process CPU collectives need the gloo implementation.
        # Empty `platforms` means the backend default may still resolve
        # to CPU, so configure gloo then too — the flag only affects the
        # CPU backend, a TPU/GPU resolution ignores it.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: flag absent, gloo is the default
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # autodetect path: already initialized / single-process environment


def create_mesh(
    devices: Sequence[jax.Device] | None = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices.

    ICI topology note: jax orders local devices so that adjacent ids are
    ICI neighbours on a slice; keeping the model axis innermost puts
    tensor-parallel collectives on the shortest links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"device count {n} not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; rest replicated."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"size {n_data}"
        )
    return global_batch // n_data


def pad_to_multiple(n: int, m: int) -> int:
    """Round n up to a multiple of m (static-shape padding for eval tails)."""
    return int(math.ceil(n / m) * m)


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax versions: `jax.shard_map` since 0.8 (kwarg
    `check_vma`), `jax.experimental.shard_map.shard_map` before
    (`check_rep`).  Replication checking is disabled — our bodies use
    collectives the checker cannot type (ppermute rings, psum subsets)."""
    try:
        smap = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as smap

    import inspect

    try:
        kw = (
            "check_vma"
            if "check_vma" in inspect.signature(smap).parameters
            else "check_rep"
        )
    except (TypeError, ValueError):  # builtins / odd wrappers
        kw = "check_vma"
    return smap(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                **{kw: False})
