"""ctypes loader for the native C++ graph-runtime components.

Compiles ``ellplan.cpp`` with the system C++ toolchain on first use (cached
as ``libellplan.so`` next to the source; rebuilt when the source is newer).
Falls back gracefully: importers should catch exceptions from
:func:`load_ellplan` and use the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ellplan.cpp")
_LIB = os.path.join(_DIR, "libellplan.so")

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True, capture_output=True,
    )


def load_ellplan():
    """Return the ctypes handle with typed signatures (builds if needed)."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ell_chunks.restype = ctypes.c_int64
    lib.ell_chunks.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                               i64p, i64p, i64p]
    lib.ell_fill_slots.restype = None
    lib.ell_fill_slots.argtypes = [i64p, i64p, i64p, i64p, i64p, i64p,
                                   i64p, ctypes.c_int64, i64p, f32p, i64p]
    _lib = lib
    return lib


def as_i64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def as_f32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
