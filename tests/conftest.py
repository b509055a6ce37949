"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharded/multi-chip code paths are
exercised without TPU hardware (mirrors the reference's thread-count sweep
testing technique, reference qmf/test/WALSEngineTest.cpp:113, extended to
device counts). Must run before the first jax import.
"""

import os

# Force CPU: the surrounding environment may preset JAX_PLATFORMS to a TPU
# platform; unit tests must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The surrounding environment may have captured JAX_PLATFORMS before this
# conftest ran (a sitecustomize pre-imports jax for the TPU plugin), so the
# env var alone isn't enough — update the live config too.
jax.config.update("jax_platforms", "cpu")

# Enable x64 so float64 oracle paths can run on the CPU test backend
# (library code pins dtypes explicitly, so float32 paths are unaffected).
jax.config.update("jax_enable_x64", True)
