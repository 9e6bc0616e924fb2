"""Frequency-split gather table for the >1M-row regime.

Beyond ~1M rows the lane-padded gather table exceeds the on-chip
residency envelope at every packing factor (q saturates at 4; ~10 ns/slot
at amazon scale vs ~2.2 at arxiv — docs/ROADMAP.md "Very large tables").
But power-law degree distributions concentrate edge *references*: after a
degree sort the hottest columns are the FIRST rows of the table, and a
small prefix of columns covers most edges (the same row-skew motif the
reference's row_analysis/ notebook documents).

The split: columns below ``hot_rows`` form a resident prefix table
(footprint chosen to fit the ~100 MB envelope → q=1, full gather speed);
the cold tail keeps the packed-q path over its own (smaller) table. Each
edge goes to exactly one side, so the SpMM is two independent packed-ELL
matmuls summed:

    out = A_hot @ x[:H]  +  A_cold @ x[H:]

Both sides reuse the ordinary EllAdj machinery (hub splitting, spans,
chunks, custom VJP); differentiation through the slices composes
automatically. The parts are rectangular, so each carries explicit
transpose arrays (~2x the adjacency bytes of the symmetric-aliased
single-table form — the price of the split).

Measured decision point (synth-amazon, n=1.57M, k=32, chained protocol):
see results/freq_split_amazon.json.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.graph.csr import CSRGraph
from gcn_tpu.tile.ell import DEFAULT_K_PAD, EllAdj, ell_adjacency


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hot", "cold", "hot_unperm", "cold_unperm"],
    meta_fields=["hot_rows", "n_rows", "n_cols", "nnz", "hot_nnz"],
)
@dataclasses.dataclass(frozen=True)
class FreqSplitAdj:
    """Two-table split adjacency (see module docstring).

    Each part's rows are re-sorted by the part's OWN degree (a row's hot
    and cold degrees differ, so the global order leaves part windows
    inhomogeneous — measured +50% padded slots on synth-amazon without
    the per-part sort). ``*_unperm`` maps the part output back to global
    rows: out = take(hot_out, hot_unperm) + take(cold_out, cold_unperm),
    two n-row gathers (~2-3 ns/row) against tens of ms of padded-slot
    gathers saved."""

    hot: EllAdj    # (n_rows, hot_rows): columns < hot_rows
    # (n_rows, n_cols - hot_rows), columns shifted by -H; None when the
    # whole table fits hot (hot_rows == n_cols — no cold part)
    cold: EllAdj
    hot_unperm: jnp.ndarray    # int32[n_rows]: global row -> hot-part row
    cold_unperm: jnp.ndarray   # int32[n_rows]
    hot_rows: int
    n_rows: int
    n_cols: int
    nnz: int
    hot_nnz: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def k_pad(self) -> int:
        """Widest supported feature chunk (both parts share it) — lets
        hoist_spmm pick its column chunk like for a plain EllAdj."""
        return self.hot.k_pad

    @property
    def hot_edge_fraction(self) -> float:
        return self.hot_nnz / max(self.nnz, 1)

    def validate(self) -> None:
        """Format-invariant walker over the split (extends
        EllAdj.validate, the reference safety_check analogue): both
        parts' internal invariants plus the split bookkeeping."""
        assert 0 < self.hot_rows <= self.n_cols, "hot_rows out of range"
        assert self.hot.shape == (self.n_rows, self.hot_rows), \
            "hot part shape mismatch"
        self.hot.validate()
        if self.cold is None:
            assert self.hot_rows == self.n_cols, \
                "missing cold part despite hot_rows < n_cols"
            assert self.hot_nnz == self.nnz, \
                "edges lost: no cold part but hot_nnz < nnz"
        else:
            assert self.cold.shape == (self.n_rows,
                                       self.n_cols - self.hot_rows), \
                "cold part shape mismatch"
            self.cold.validate()
            assert self.hot.nnz == self.hot_nnz, \
                "hot_nnz bookkeeping drifted from the hot part"
            assert self.hot.nnz + self.cold.nnz == self.nnz, \
                "edges lost across the split"
        for unperm in (self.hot_unperm, self.cold_unperm):
            if unperm is not None:
                u = np.sort(np.asarray(unperm))
                assert (u == np.arange(self.n_rows)).all(), \
                    "un-permute map is not a permutation"


def default_hot_rows(n_cols: int, table_bf16: bool = False) -> int:
    """Hot-table height: HALF the residency envelope — the measured
    optimum of the synth-amazon H-sweep (bf16, n=1.57M, chained
    protocol; all with the global row order kept):

        H rows   hot table   total ms   vs single-table bf16 (215.7)
        204800      52 MB      203.9       1.06x  <- envelope/2
        286720      74 MB      228.3       0.94x  (old co-fit default)
        409600     105 MB      302.5       0.71x  (cold thrashes, 13.7
                                                   ns/slot vs 7.2)

    hot (unpacked) and cold (packed) tables alternate accesses, so they
    CO-occupy the envelope; pushing hot past half of it evicts the cold
    table faster than the extra unpacked coverage pays back. When the
    whole table fits the envelope there is nothing to split — returns
    n_cols (ell_adjacency_freq then builds no cold part)."""
    # the authoritative residency envelope — the same constant that
    # drives the single-table adaptive q
    from gcn_tpu.ops.ell_spmm import _TABLE_BUDGET_BYTES

    dsize = 2 if table_bf16 else 4
    raw = _TABLE_BUDGET_BYTES // (128 * dsize)
    if n_cols <= raw:
        return n_cols   # unrounded: hot_rows == n_cols means NO split
    return max(8, min(raw // 2, n_cols)) // 8 * 8


def freq_split_order(g: CSRGraph, *, hot_rows: int = None,
                     table_bf16: bool = False):
    """Part-aware global vertex order for the frequency split (round 4).

    With the global degree order, a window's rows have homogeneous TOTAL
    degree but heterogeneous hot/cold splits, so BOTH part tables pad
    heavily (measured 0.38/0.50 hot/cold pad on synth-amazon). Re-sorting
    rows by COLD-part degree *within each segment* — the hot prefix
    [0, H) and the tail [H, n) separately, so the hot column SET stays
    exactly the prefix and the split slices x[:H] unchanged — makes cold
    windows homogeneous in the expensive packed table and mostly
    homogenizes hot windows too (hot_deg ~ total - cold_deg within a
    degree-sorted segment). Symmetric permutation: rows and columns move
    together, so no un-permute gather is needed anywhere (the round-3
    asymmetric per-part sort lost ~51 ms/application to exactly that).

    Exact slot counts from the sweep (examples/bench_freq_split.py
    --order-sweep, synth-amazon bf16): hot pad 0.38->0.30, cold pad
    0.50->0.30, paper cost 1.29x better; measured TPU confirmation in
    results/freq_split_amazon.json. Returns the order array
    (order[new]=old), or None when the table fits residency (no split).
    Apply BEFORE building the split, composing into the model's
    permutation chain like any reorder pass.
    """
    n, m = g.shape
    if hot_rows is None:
        hot_rows = default_hot_rows(m, table_bf16)
    if hot_rows >= m:
        return None
    rows_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
    cold_deg = np.bincount(rows_of[g.indices >= hot_rows], minlength=n)
    pre = np.argsort(-cold_deg[:hot_rows], kind="stable")
    tail = hot_rows + np.argsort(-cold_deg[hot_rows:], kind="stable")
    return np.concatenate([pre, tail])


def ell_adjacency_freq(
    g: CSRGraph,
    *,
    hot_rows: int = None,
    table_bf16: bool = False,
    part_sort: bool = False,
    **kw,
) -> FreqSplitAdj:
    """Split ``g`` by column hotness and tile both sides.

    Use when the full lane-padded table is far past the residency
    envelope (n over ~1M f32 / ~2M bf16 at k_pad<=32); below that the
    single-table ``ell_adjacency`` wins (no split overhead). Rows should
    be degree-sorted first so hot columns are the prefix.

    ``part_sort``: re-sort each part's rows by the part's own degree —
    perfect per-part fill, but each part's output then needs an n-row
    un-permute gather, MEASURED at ~51 ms each at amazon scale (n=1.57M;
    the un-permute table is itself past residency). Keeping the global
    row order costs ~25% padded slots instead (~30 ms of wasted gathers)
    and needs no un-permute, so False wins at every scale measured —
    kept as a knob for future regimes.
    """
    n, m = g.shape
    if hot_rows is None:
        hot_rows = default_hot_rows(m, table_bf16)
    hot_rows = min(hot_rows, m)
    assert 0 < hot_rows, "hot_rows must be positive"

    mask = g.indices < hot_rows
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))

    def part(keep, n_cols, shift):
        cnt = np.bincount(rows[keep], minlength=n)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=indptr[1:])
        csr = CSRGraph(indptr, g.indices[keep] - shift, g.data[keep],
                       (n, n_cols))
        if not part_sort:
            return csr, None
        # per-part degree sort (row gather; columns stay sorted) + the
        # inverse map used to un-permute the part's SpMM output
        order = np.argsort(-cnt, kind="stable").astype(np.int64)
        counts = cnt[order]
        indptr2 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr2[1:])
        ofs = np.arange(csr.nnz, dtype=np.int64) - np.repeat(
            indptr2[:-1], counts)
        src = np.repeat(indptr[order], counts) + ofs
        sorted_csr = CSRGraph(indptr2, csr.indices[src], csr.data[src],
                              (n, n_cols))
        unperm = np.empty(n, dtype=np.int32)
        unperm[order] = np.arange(n, dtype=np.int32)
        return sorted_csr, jnp.asarray(unperm)

    hot_g, hot_unperm = part(mask, hot_rows, 0)
    hot = ell_adjacency(hot_g, symmetric=False, table_bf16=table_bf16,
                        **kw)
    if hot_rows == m:
        # whole table fits the hot prefix — no cold part (the container
        # keeps single-table semantics so callers need no special case)
        cold = cold_unperm = None
    else:
        cold_g, cold_unperm = part(~mask, m - hot_rows, hot_rows)
        cold = ell_adjacency(cold_g, symmetric=False,
                             table_bf16=table_bf16, **kw)
    return FreqSplitAdj(hot=hot, cold=cold,
                        hot_unperm=hot_unperm, cold_unperm=cold_unperm,
                        hot_rows=hot_rows,
                        n_rows=n, n_cols=m, nnz=g.nnz, hot_nnz=hot_g.nnz)


def spmm_ell_freq(fs: FreqSplitAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x through the frequency-split tables; differentiable
    (two spmm_ell custom-VJP calls composed with slices and the
    un-permute gathers)."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    hot = spmm_ell(fs.hot, x[:fs.hot_rows])
    if fs.hot_unperm is not None:
        hot = jnp.take(hot, fs.hot_unperm, axis=0)
    if fs.cold is None:
        return hot
    cold = spmm_ell(fs.cold, x[fs.hot_rows:])
    if fs.cold_unperm is not None:
        cold = jnp.take(cold, fs.cold_unperm, axis=0)
    return hot + cold
