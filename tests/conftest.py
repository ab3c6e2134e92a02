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

# ---- quick tier (`pytest -m quick`): a ~5-min smoke slice touching every
# subsystem, for routine pre-commit checks on this 1-core host (the full
# suite runs ~75 min).  Selection is by FILE — each file below is fast in
# its entirety and covers one subsystem's surface.
QUICK_FILES = {
    "test_core.py",            # mesh/config/metrics/schedules
    "test_queue.py",           # MoCo queue state machine
    "test_moma.py",            # MoMA step wiring + variants
    "test_cli_help.py",        # every CLI entry imports + parses
    "test_losses_parity.py",   # KD loss zoo vs reference formulas
    "test_data_pipeline.py",   # loaders/manifests/packed cache
    "test_checkpoint_async.py",# orbax save/restore + async commit
    "test_preempt.py",         # GracefulStop + resume
    "test_tb_writer.py",       # TB event writer
    "test_cmo_viz.py",         # attn modes + viz maps
    "test_fused_bn.py",        # custom-VJP BN
    "test_quick_smokes.py",    # flash/quantize/export/tp/pp/moe/native
}
# deliberately NOT quick (measured): test_flash_attention (a 171 s
# interpret-mode kernel test), test_graft_entry (132 s dryrun),
# test_models_contract / test_randaugment (many-model / golden sweeps).
# Subsystems those files own are still smoke-covered in the quick tier
# via test_quick_smokes.py (VERDICT r3 #6).


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast per-subsystem smoke slice (pytest -m quick)")
    config.addinivalue_line(
        "markers", "slow: multi-minute convergence/e2e tests")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in QUICK_FILES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def mesh8():
    from moma_tpu.core.mesh import create_mesh

    assert len(jax.devices()) == 8, "virtual device count not applied"
    return create_mesh()


@pytest.fixture(scope="session")
def mesh4x2():
    from moma_tpu.core.mesh import create_mesh

    return create_mesh(model_parallel=2)
