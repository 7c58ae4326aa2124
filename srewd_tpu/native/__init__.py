"""Native (C++) runtime components, loaded via ctypes with Python fallback.

`read_batch` is the hot host-side path: WeatherStore.read_many routes bulk
.npy loads through the fastnpy shared library (parallel preads into one
preallocated batch buffer; the ctypes call releases the GIL). If the shared
library is absent it is compiled on first use with the system C++ compiler;
if that fails (no compiler, sandbox), callers fall back to numpy loads —
behaviour is identical either way, only throughput differs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastnpy.cpp")
_LIB_PATH = os.path.join(_DIR, "_fastnpy.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile() -> bool:
    """Build _fastnpy.so next to the source. Atomic rename, best-effort."""
    for cxx in ("c++", "g++", "clang++"):
        try:
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=_DIR, delete=False
            ) as tmp:
                tmp_path = tmp.name
            proc = subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", tmp_path],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode == 0:
                os.replace(tmp_path, _LIB_PATH)
                return True
            os.unlink(tmp_path)
        except (OSError, subprocess.SubprocessError):
            pass
    return False


def get_lib():
    """The loaded fastnpy library, or None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _compile():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fastnpy_read_batch.restype = ctypes.c_int
            lib.fastnpy_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.fastnpy_version.restype = ctypes.c_int
            if lib.fastnpy_version() != 1:
                raise OSError("fastnpy ABI mismatch")
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def read_batch(paths: list[str], item_shape: tuple, threads: int = 8) -> np.ndarray | None:
    """Read `paths` into one [N, *item_shape] float32 array, or None on failure.

    None means "use the numpy fallback" — any unsupported file (dtype,
    fortran order, truncation) degrades gracefully rather than erroring.
    """
    lib = get_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    item_floats = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fastnpy_read_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        item_floats,
        int(threads),
    )
    return out if rc == 0 else None
