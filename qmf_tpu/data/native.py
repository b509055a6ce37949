"""ctypes bindings to the native C++ IO library (qmf_tpu/_native).

The reference's data loader and factor writer are C++ (qmf/DatasetReader.cpp,
qmf/Engine.cpp:98-122); this module binds our C++ equivalents — an
mmap+parallel text parser and a fixed-9-decimal factor writer — built as a
shared library by ``qmf_tpu/_native/Makefile``. All callers degrade
gracefully to numpy/Python paths when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_NAME = "libqmf_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "_native", _LIB_NAME)


def _try_build() -> None:
    """Build libqmf_native.so in-tree on first use (role parity with the
    reference's compiled loader, qmf/DatasetReader.cpp). A fresh checkout
    has no build step, so a missing .so means "not built yet", not
    "unavailable" — one `make` takes ~2 s. Failures (no toolchain,
    read-only tree) degrade silently to the numpy/Python parsers."""
    import subprocess

    native_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "_native")
    )
    try:
        # serialize concurrent builders (parallel tests / scheduler+worker
        # processes): without the lock one process can dlopen a half-linked
        # .so another is still writing
        import fcntl

        with open(os.path.join(native_dir, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", native_dir],
                capture_output=True,
                timeout=120,
                check=True,
            )
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path):
        _try_build()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # corrupt/partial artifact (e.g. a build killed mid-link): degrade
        # to the numpy/Python parsers like every other unavailability case
        return None

    lib.qmf_count_lines.argtypes = [ctypes.c_char_p]
    lib.qmf_count_lines.restype = ctypes.c_longlong

    lib.qmf_read_dataset.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),  # user_ids out
        ctypes.POINTER(ctypes.c_longlong),  # item_ids out
        ctypes.POINTER(ctypes.c_double),  # values out
        ctypes.c_longlong,  # capacity
        ctypes.POINTER(ctypes.c_longlong),  # err_line out (parse errors)
    ]
    lib.qmf_read_dataset.restype = ctypes.c_longlong

    lib.qmf_write_factors.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),  # ids
        ctypes.POINTER(ctypes.c_double),  # factors (row-major)
        ctypes.POINTER(ctypes.c_double),  # biases (nullable)
        ctypes.c_longlong,  # nelems
        ctypes.c_longlong,  # nfactors
    ]
    lib.qmf_write_factors.restype = ctypes.c_int

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_dataset(path: str):
    from qmf_tpu.data.dataset import Dataset

    lib = _load()
    assert lib is not None
    path_b = path.encode()
    n = lib.qmf_count_lines(path_b)
    if n < 0:
        raise IOError(f"native reader failed to open {path}")
    users = np.empty(n, dtype=np.int64)
    items = np.empty(n, dtype=np.int64)
    values = np.empty(n, dtype=np.float64)
    err_line = ctypes.c_longlong(0)
    got = lib.qmf_read_dataset(
        path_b,
        users.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        items.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        ctypes.byref(err_line),
    )
    if got == -1:  # QMF_ERR_OPEN
        raise IOError(f"native reader failed to open {path}")
    if got == -2:  # QMF_ERR_CAPACITY: file grew between count and read
        raise IOError(
            f"{path} changed while being read (more lines than counted)"
        )
    if got == -3:  # QMF_ERR_PARSE
        raise ValueError(
            f"the file format is incorrect: {path} (line {err_line.value})"
        )
    if got < 0:
        raise IOError(f"native reader failed for {path} (code {got})")
    return Dataset(users[:got], items[:got], values[:got])


def write_factors(
    path: str,
    ids: np.ndarray,
    factors: np.ndarray,
    biases: Optional[np.ndarray],
) -> None:
    lib = _load()
    assert lib is not None
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    factors = np.ascontiguousarray(factors, dtype=np.float64)
    biases_ptr = (
        np.ascontiguousarray(biases, dtype=np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)
        )
        if biases is not None
        else None
    )
    rc = lib.qmf_write_factors(
        path.encode(),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        factors.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        biases_ptr,
        factors.shape[0],
        factors.shape[1],
    )
    if rc != 0:
        raise IOError(f"native factor writer failed for {path}")
