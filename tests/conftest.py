"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import.

This is the TPU build's 'fake backend' (SURVEY.md §4): distributed code
paths (sharding, collectives, sync-BN, MoCo key gathering) run under
pytest on any machine with no TPU attached.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep CPU tests deterministic and fast
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the build image pins JAX_PLATFORMS=axon (real TPU) via a site hook that
# overrides the env var; force CPU for the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from moma_tpu.core.mesh import create_mesh

    assert len(jax.devices()) == 8, "virtual device count not applied"
    return create_mesh()


@pytest.fixture(scope="session")
def mesh4x2():
    from moma_tpu.core.mesh import create_mesh

    return create_mesh(model_parallel=2)
