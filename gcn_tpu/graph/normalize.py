"""Graph/feature normalization used by GCN training.

Numerics match the reference exactly:
  * ``gcn_normalize``: D^{-1/2} (A + I) D^{-1/2}, with the self-loop added
    only when the diagonal is empty at (0,0) — pygcn/gcnio/util/utils.py:78-90.
  * ``row_normalize``: D^{-1} A with inf->0 — utils.py:64-76.
  * ``row_normalize_features``: row-sum normalize a dense feature matrix.
"""

from __future__ import annotations

import numpy as np

from gcn_tpu.graph.csr import CSRGraph


def _has_nonzero_diag_head(g: CSRGraph) -> bool:
    # Reference checks mx[0, 0] == 0 to decide whether to add self loops
    # (utils.py:81) — preserve that exact (quirky) rule.
    row0 = g.indices[g.indptr[0]:g.indptr[1]]
    if 0 in row0:
        v = g.data[g.indptr[0]:g.indptr[1]][row0 == 0]
        return bool(np.any(v != 0))
    return False


def gcn_normalize(g: CSRGraph, *, add_self_loops: bool | None = None) -> CSRGraph:
    """Symmetric GCN normalization D^{-1/2} (A + I) D^{-1/2}.

    Args:
        g: square adjacency.
        add_self_loops: force self-loop addition on/off; default replicates the
            reference's "add I iff A[0,0] == 0" rule (utils.py:81-83).
    """
    assert g.shape[0] == g.shape[1]
    if add_self_loops is None:
        add_self_loops = not _has_nonzero_diag_head(g)
    if add_self_loops:
        g = g.with_self_loops()
    # scaling never moves entries: keep the CSR structure, skip the
    # COO round-trip + re-sort (was ~14 s at yelp scale)
    r = np.repeat(np.arange(g.shape[0], dtype=np.int64),
                  np.diff(g.indptr))
    v = g.data.astype(np.float64)
    rowsum = np.bincount(r, weights=v, minlength=g.shape[0])
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(rowsum, -0.5)
    d_inv_sqrt[~np.isfinite(d_inv_sqrt)] = 0.0
    vals = (d_inv_sqrt[r] * v * d_inv_sqrt[g.indices]).astype(np.float32)
    return CSRGraph(g.indptr, g.indices, vals, g.shape)


def row_normalize(g: CSRGraph, *, add_self_loops: bool | None = None) -> CSRGraph:
    """Row-stochastic normalization D^{-1} A (utils.py:64-76)."""
    if add_self_loops is None:
        add_self_loops = not _has_nonzero_diag_head(g)
    if add_self_loops:
        g = g.with_self_loops()
    r = np.repeat(np.arange(g.shape[0], dtype=np.int64),
                  np.diff(g.indptr))
    v = g.data.astype(np.float64)
    rowsum = np.bincount(r, weights=v, minlength=g.shape[0])
    with np.errstate(divide="ignore"):
        d_inv = 1.0 / rowsum
    d_inv[~np.isfinite(d_inv)] = 0.0
    vals = (d_inv[r] * v).astype(np.float32)
    return CSRGraph(g.indptr, g.indices, vals, g.shape)


def row_normalize_features(x: np.ndarray) -> np.ndarray:
    """Row-sum normalize dense features (utils.py:64-76 applied to X)."""
    x = np.asarray(x, dtype=np.float32)
    s = x.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(s != 0, 1.0 / s, 0.0)
    return (x * inv).astype(np.float32)
