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

# the measured residency envelope (ops/ell_spmm.py:_TABLE_BUDGET_BYTES)
_BUDGET = 100 * 1024 * 1024


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hot", "cold"],
    meta_fields=["hot_rows", "n_rows", "n_cols", "nnz", "hot_nnz"],
)
@dataclasses.dataclass(frozen=True)
class FreqSplitAdj:
    """Two-table split adjacency (see module docstring)."""

    hot: EllAdj    # (n_rows, hot_rows): columns < hot_rows
    cold: EllAdj   # (n_rows, n_cols - hot_rows): columns shifted by -H
    hot_rows: int
    n_rows: int
    n_cols: int
    nnz: int
    hot_nnz: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def hot_edge_fraction(self) -> float:
        return self.hot_nnz / max(self.nnz, 1)


def default_hot_rows(n_cols: int, table_bf16: bool = False) -> int:
    """Largest hot-table height whose lane-padded footprint stays
    resident (rows x 128 lanes x dtype bytes <= the ~100 MB envelope)."""
    dsize = 2 if table_bf16 else 4
    return (_BUDGET // (128 * dsize)) // 8 * 8


def ell_adjacency_freq(
    g: CSRGraph,
    *,
    hot_rows: int = None,
    table_bf16: bool = False,
    **kw,
) -> FreqSplitAdj:
    """Split ``g`` by column hotness and tile both sides.

    Use when the full lane-padded table is far past the residency
    envelope (n over ~1M f32 / ~2M bf16 at k_pad<=32); below that the
    single-table ``ell_adjacency`` wins (no split overhead). Rows should
    be degree-sorted first so hot columns are the prefix.
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
        return CSRGraph(indptr, g.indices[keep] - shift, g.data[keep],
                        (n, n_cols))

    hot_g = part(mask, hot_rows, 0)
    cold_g = part(~mask, m - hot_rows, hot_rows)
    hot = ell_adjacency(hot_g, symmetric=False, table_bf16=table_bf16,
                        **kw)
    cold = ell_adjacency(cold_g, symmetric=False, table_bf16=table_bf16,
                         **kw)
    return FreqSplitAdj(hot=hot, cold=cold, hot_rows=hot_rows,
                        n_rows=n, n_cols=m, nnz=g.nnz, hot_nnz=hot_g.nnz)


def spmm_ell_freq(fs: FreqSplitAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x through the frequency-split tables; differentiable
    (two spmm_ell custom-VJP calls composed with slices)."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    return (spmm_ell(fs.hot, x[:fs.hot_rows])
            + spmm_ell(fs.cold, x[fs.hot_rows:]))
