"""Test harness: run everything on a fake 8-device CPU mesh.

Multi-chip semantics (GSPMD data parallelism, cross-replica BN statistics)
are validated without TPU hardware by forcing the host platform to expose 8
virtual devices — the TPU-native analogue of the reference's 2-GPU sync-BN
tests (reference: lib/nn/modules/tests/test_sync_batchnorm.py).

Note: this image's sitecustomize registers an 'axon' TPU PJRT plugin and
forces ``jax_platforms=axon,cpu`` programmatically, so the env var alone is
not enough — we must override the config after importing jax (before any
backend is initialised).  This also prevents the test process from claiming
the single TPU and deadlocking against a concurrent benchmark process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Test tiering: `pytest -m smoke` selects one fast file per subsystem
# (~3 min on a 1-core host; the full suite extrapolates to ~2h there).
# Files — not individual tests — are marked so the smoke tier stays in sync
# as tests are added to these files.
# ---------------------------------------------------------------------------
_SMOKE_FILES = {
    "test_metrics.py",            # metrics (Evaluator, VC kernel)
    "test_ops.py",                # core ops (resize, warp, grid_sample)
    "test_config.py",             # config system
    "test_sharding_rules.py",     # tensor-parallel sharding rules
    "test_data.py",               # datasets + loader
    "test_batchnorm.py",          # sync-BN on the 8-device mesh
    "test_native.py",             # C++ host ops
    "test_checkpoint_extras.py",  # checkpoint backends
    "test_models.py",             # backbone/decoder forwards
    "test_e2e_frame.py",          # train->eval end to end
    "test_pallas.py",             # pallas kernels (interpret mode)
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.path.name in _SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
