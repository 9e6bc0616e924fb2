"""Vertex reordering for SpMM locality.

TPU-era equivalent of the reference's renumbering library (renumber.cu,
order_*.cu, SURVEY.md §2a): a family of passes that permute the graph so
neighborhoods become contiguous, which on TPU maximizes row-panel/column-
window tile density (gcn_tpu.tile) and minimizes cross-shard halo traffic
(gcn_tpu.parallel).

Methods (perm[new] = old, the reference's ``vomp`` convention):
  identity | degree | degree_in | degree_out | dfs | rcm | gorder | rabbit

Every pass is validated by a permutation check plus a graph-isomorphism
checksum, the same self-verification the reference performs after each pass
(renumber.cu:123-149, 287-313).

A native C++ implementation (gcn_tpu/reorder/csrc) is used when built; pure
numpy/scipy fallbacks otherwise.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gcn_tpu.graph.csr import CSRGraph

METHODS = ("identity", "degree", "degree_in", "degree_out", "dfs", "rcm",
           "gorder", "gorder3", "rabbit")
# passes implemented in the native library; the rest are numpy-only
# (degree_in/degree_out are single argsorts — no native win to be had)
_NATIVE_METHODS = ("degree", "dfs", "rcm", "gorder", "gorder3", "rabbit")


def compute_permutation(g: CSRGraph, method: str = "rabbit",
                        prefer_native: bool = True) -> np.ndarray:
    """Return perm (int32[n], perm[new]=old) for the given method."""
    if method not in METHODS:
        raise ValueError(f"unknown reorder method {method!r}; options: {METHODS}")
    if method == "identity":
        return np.arange(g.shape[0], dtype=np.int32)
    if prefer_native and method in _NATIVE_METHODS:
        from gcn_tpu.reorder import native

        if native.available():
            return native.compute_permutation(g, method)
    from gcn_tpu.reorder import python_impl

    return getattr(python_impl, f"{method}_order")(g)


def reorder_graph(g: CSRGraph, method: str = "rabbit", *,
                  prefer_native: bool = True,
                  verify: bool = True) -> Tuple[CSRGraph, np.ndarray]:
    """Compute a permutation and apply it symmetrically.

    Returns (permuted graph, perm) with perm[new] = old. The permuted graph
    has sorted column ids per row, as the tiler requires (renumber.cu:105).
    """
    perm = compute_permutation(g, method, prefer_native=prefer_native)
    validate_permutation(perm, g.shape[0])
    g2 = g.permute(perm)
    if verify:
        a = np.sort(g.isomorphism_checksum())
        b = np.sort(g2.isomorphism_checksum())
        if not np.allclose(a, b, rtol=1e-9, atol=1e-6):
            raise AssertionError(
                f"reorder {method!r} broke the graph: checksum mismatch")
    return g2, perm


def reorder_stats(g: CSRGraph) -> dict:
    """Rabbit community statistics — the printout the reference's pass
    emits (renumber.cu:514-518): community count and modularity Q.

    Runs the pure-python clustering (the native pass does not export its
    dendrogram); intended for analysis, not the hot path.
    """
    from gcn_tpu.reorder import python_impl

    _, communities = python_impl.rabbit_order(g, return_communities=True)
    q = python_impl.modularity(g, communities)
    sizes = np.bincount(communities)
    return {
        "communities": int(len(sizes)),
        "modularity": float(q),
        "largest_community": int(sizes.max()),
        "singleton_communities": int((sizes == 1).sum()),
    }


def validate_permutation(perm: np.ndarray, n: int) -> None:
    assert perm.shape == (n,), f"perm shape {perm.shape} != ({n},)"
    seen = np.zeros(n, dtype=bool)
    seen[perm] = True
    assert seen.all(), "not a permutation: missing indices"


def save_order(path: str, perm: np.ndarray) -> None:
    """Write an order file in the reference's format (inout.cu:27-37).

    The reference stores RANK vectors — line u holds the new id of old
    vertex u (rank[old]=new, cf. rank_from_order tools.cu:31-43) — while
    this package passes permutations as perm[new]=old (the vomp
    convention). The inverse is applied here so files interchange with
    the reference tooling."""
    perm = np.asarray(perm, dtype=np.int64)
    rank = np.empty_like(perm)
    rank[perm] = np.arange(perm.shape[0])
    np.savetxt(path, rank, fmt="%d")


def load_order(path: str, n: int = None) -> np.ndarray:
    """Read a reference-format order file (rank[old]=new, one per line,
    inout.cu:20-24) -> perm[new]=old; validated when ``n`` is given."""
    rank = np.loadtxt(path, dtype=np.int64).reshape(-1)
    perm = np.empty_like(rank)
    perm[rank] = np.arange(rank.shape[0])
    perm = perm.astype(np.int32)
    if n is not None:
        validate_permutation(perm, n)
    return perm
