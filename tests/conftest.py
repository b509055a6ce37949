"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharded/multi-chip code paths are
exercised without TPU hardware (mirrors the reference's thread-count sweep
testing technique, reference qmf/test/WALSEngineTest.cpp:113, extended to
device counts). Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
