"""Shared CLI helpers."""

from __future__ import annotations

import os


def configure_platform() -> None:
    """Honor QMF_TPU_PLATFORM=cpu|tpu|... even when the surrounding
    environment pinned JAX_PLATFORMS before interpreter start (some
    deployments capture it in sitecustomize, making the env var a no-op)."""
    platform = os.environ.get("QMF_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    if os.environ.get("QMF_TPU_X64"):
        # full float64 mode (CPU-only; TPUs have no f64 linear algebra) —
        # used for golden cross-checks against the reference's f64 math
        import jax

        jax.config.update("jax_enable_x64", True)


def enable_compilation_cache() -> None:
    """Enable jax's persistent compilation cache for fast repeat CLI runs.

    First XLA compilation of each program shape can take tens of seconds
    (especially via a remote TPU compile service); the persistent cache makes
    subsequent identical runs start instantly. Opt out with
    QMF_TPU_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("QMF_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "QMF_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "qmf_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort
        pass
