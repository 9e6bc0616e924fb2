"""ctypes binding for the native C++ ELL tiler.

Build: ``make -C gcn_tpu/tile/csrc`` producing ``libgcntiler.so``. The
exported two-phase contract (ell_plan / ell_fill) mirrors the CSR-pointer
convention of the reference's csr2tile (tile.cu:104-106); falls back to the
vectorized numpy tiler when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO = os.path.join(_CSRC, "libgcntiler.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    # Always invoke make (a timestamp no-op when the .so is fresh) so edits
    # to tiler.cpp can never be shadowed by a stale committed binary.
    try:
        subprocess.run(["make", "-s", "-C", _CSRC], check=True,
                       capture_output=True, timeout=600)
    except Exception as e:
        if not os.path.exists(_SO):
            _load_failed = True
            return None
        import warnings

        warnings.warn(
            f"native tiler rebuild failed ({e!r}); loading the EXISTING "
            f"{_SO} — it may be stale relative to tiler.cpp")
    try:
        lib = ctypes.CDLL(_SO)
        lib.ell_plan.restype = ctypes.c_int
        lib.ell_plan.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, _i64p, _i64p]
        lib.ell_fill.restype = ctypes.c_int
        lib.ell_fill.argtypes = [_i32p, _i32p, _f32p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int64,
                                 _i32p, _f32p, _i32p]
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale .so (rebuild failed above) missing one
        # of the exported symbols — treat as unavailable, don't crash
        _load_failed = True
    return _lib


def available() -> bool:
    return _try_load() is not None


def ell_arrays(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
               n: int, r: int, p: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native counterpart of gcn_tpu.tile.ell._ell_arrays."""
    lib = _try_load()
    assert lib is not None, "native tiler unavailable"
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    nw = ctypes.c_int64()
    nb = ctypes.c_int64()
    rc = lib.ell_plan(indptr.ctypes.data_as(_i32p), n, r, p,
                      ctypes.byref(nw), ctypes.byref(nb))
    assert rc == 0, f"ell_plan failed: {rc}"
    num_blocks = nb.value
    cols = np.zeros((num_blocks, p, r), dtype=np.int32)
    vals = np.zeros((num_blocks, p, r), dtype=np.float32)
    win = np.zeros(num_blocks, dtype=np.int32)
    rc = lib.ell_fill(
        indptr.ctypes.data_as(_i32p), indices.ctypes.data_as(_i32p),
        data.ctypes.data_as(_f32p), n, r, p,
        cols.ctypes.data_as(_i32p), vals.ctypes.data_as(_f32p),
        win.ctypes.data_as(_i32p))
    assert rc == 0, f"ell_fill failed: {rc}"
    return cols, vals, win
