"""ctypes binding for the native C++ reordering library.

Build: ``make -C gcn_tpu/reorder/csrc`` (see csrc/Makefile) producing
``libgcnreorder.so``. The exported contract mirrors the reference's
``extern "C"`` CSR-pointer interface (renumber.cu:23) but computes the
permutation only — applying it is vectorized numpy on the Python side.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from gcn_tpu.graph.csr import CSRGraph

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO = os.path.join(_CSRC, "libgcnreorder.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    # Always invoke make (a timestamp no-op when the .so is fresh) so edits
    # to the C++ sources can never be shadowed by a stale binary.
    try:
        subprocess.run(
            ["make", "-s", "-C", _CSRC],
            check=True, capture_output=True, timeout=600,
        )
    except Exception as e:
        if not os.path.exists(_SO):
            _load_failed = True
            return None
        import warnings

        warnings.warn(
            f"native reorder rebuild failed ({e!r}); loading the EXISTING "
            f"{_SO} — it may be stale relative to the C++ sources")
    try:
        lib = ctypes.CDLL(_SO)
        lib.gcn_reorder.restype = ctypes.c_int
        lib.gcn_reorder.argtypes = [
            ctypes.c_char_p,                   # method
            ctypes.POINTER(ctypes.c_int32),    # indptr [n+1]
            ctypes.POINTER(ctypes.c_int32),    # indices [nnz]
            ctypes.POINTER(ctypes.c_float),    # data [nnz]
            ctypes.c_int32,                    # n
            ctypes.c_int64,                    # nnz
            ctypes.POINTER(ctypes.c_int32),    # perm_out [n]
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gcn_csr_permute.restype = ctypes.c_int
        lib.gcn_csr_permute.argtypes = [
            i32p, i32p, f32p, i32p,            # indptr, indices, data, perm
            ctypes.c_int32, ctypes.c_int64,    # n, nnz
            i32p, i32p, f32p,                  # out indptr/indices/data
        ]
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale .so (rebuild failed above) predating one
        # of the exported symbols — treat as unavailable, don't crash
        _load_failed = True
    return _lib


def available() -> bool:
    return _try_load() is not None


def csr_permute(g: CSRGraph, perm: np.ndarray) -> CSRGraph:
    """Native symmetric permutation with sorted columns (perm[new]=old).

    O(nnz) row gather + per-row sorts — replaces the numpy COO global
    lexsort, the dominant preprocessing cost at >10M-nnz scale.
    """
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native reorder library unavailable")
    n = g.shape[0]
    assert g.shape[0] == g.shape[1]
    indptr = np.ascontiguousarray(g.indptr, dtype=np.int32)
    indices = np.ascontiguousarray(g.indices, dtype=np.int32)
    data = np.ascontiguousarray(g.data, dtype=np.float32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    out_indptr = np.empty(n + 1, dtype=np.int32)
    out_indices = np.empty(g.nnz, dtype=np.int32)
    out_data = np.empty(g.nnz, dtype=np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.gcn_csr_permute(
        indptr.ctypes.data_as(i32p), indices.ctypes.data_as(i32p),
        data.ctypes.data_as(f32p), perm.ctypes.data_as(i32p),
        ctypes.c_int32(n), ctypes.c_int64(g.nnz),
        out_indptr.ctypes.data_as(i32p), out_indices.ctypes.data_as(i32p),
        out_data.ctypes.data_as(f32p))
    if rc != 0:
        raise RuntimeError(f"native csr_permute failed with code {rc}")
    return CSRGraph(out_indptr, out_indices, out_data, g.shape)


def compute_permutation(g: CSRGraph, method: str) -> np.ndarray:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native reorder library unavailable")
    n = g.shape[0]
    perm = np.empty(n, dtype=np.int32)
    indptr = np.ascontiguousarray(g.indptr, dtype=np.int32)
    indices = np.ascontiguousarray(g.indices, dtype=np.int32)
    data = np.ascontiguousarray(g.data, dtype=np.float32)
    rc = lib.gcn_reorder(
        method.encode(),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n),
        ctypes.c_int64(g.nnz),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"native reorder {method!r} failed with code {rc}")
    return perm
