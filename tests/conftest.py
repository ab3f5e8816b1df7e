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
