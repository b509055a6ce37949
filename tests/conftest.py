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

# Keep tests hermetic: CLI tests invoke main() in-process, which would
# otherwise enable the persistent XLA compilation cache for the whole
# pytest session — shared, non-atomic cache state across concurrent
# processes has produced segfaults in jax's cache deserialization
# (observed at compilation_cache.get_executable_and_time during
# test_wals on this box).
os.environ["QMF_TPU_NO_COMPILE_CACHE"] = "1"
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

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables + tracing caches at module boundaries.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    with all of them held live, late large compiles (the fused WALS
    programs in test_wals.py) have segfaulted inside LLVM on this box —
    order-dependent, never reproducible in isolation. Releasing the
    executables between modules keeps process state close to what each
    module sees when run alone.
    """
    yield
    jax.clear_caches()
