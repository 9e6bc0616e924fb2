"""Graph partitioning for multi-chip training.

1-D row partition: device d owns a contiguous band of rows (and the same
band of feature/label rows). Running a locality reordering first (Rabbit
community clustering, gcn_tpu.reorder) makes the bands community-aligned,
which is the natural edge-partitioner the reference's ordering passes imply
(SURVEY.md §7 "hard parts"): intra-community edges stay on-shard, so the
boundary set — and hence ICI traffic — shrinks.

All shards carry identical array shapes (rows padded to an equal band,
edges padded to the max shard nnz) so the stacked arrays shard cleanly over
a mesh axis with shard_map.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import numpy as np

from gcn_tpu.graph.csr import CSRGraph


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows_local", "cols", "vals"],
    meta_fields=["n_rows", "n_cols", "rows_per_shard", "n_shards", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """COO shards stacked on a leading device axis.

    rows_local: int32[n_shards, e_max]  row - shard*rows_per_shard, sorted;
                padding entries point at the last local row with val 0.
    cols:       int32[n_shards, e_max]  global column ids.
    vals:       f32[n_shards, e_max].

    Arrays are HOST numpy: the halo/tiling planners consume them on the
    host, and device placement is shard_fn's job — eager device arrays
    here forced device->host pulls that cost minutes through the axon
    relay (measured 401 s for build_halo_plan at pubmed scale vs 2 ms on
    host data).
    """

    rows_local: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    n_rows: int
    n_cols: int
    rows_per_shard: int
    n_shards: int
    nnz: int

    @property
    def n_rows_padded(self) -> int:
        return self.rows_per_shard * self.n_shards

    def boundary_fraction(self) -> float:
        """Fraction of edges whose source column lives off-shard — the
        ICI-traffic figure of merit for a partition."""
        shard_of_col = np.asarray(self.cols) // self.rows_per_shard
        shard_ids = np.arange(self.n_shards)[:, None]
        off = (shard_of_col != shard_ids) & (np.asarray(self.vals) != 0)
        return float(off.sum() / max(self.nnz, 1))


def rows_per_shard_for(n: int, n_shards: int) -> int:
    """Band height shard_graph_by_rows will use for (n, n_shards)."""
    return _round_up(_round_up(n, n_shards) // n_shards, 8)


def shard_graph_by_rows(g: CSRGraph, n_shards: int,
                        pad_edges_to: Optional[int] = None) -> ShardedGraph:
    """Partition a (square) graph into equal contiguous row bands."""
    n = g.shape[0]
    rows_per_shard = rows_per_shard_for(n, n_shards)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
    shard = rows // rows_per_shard
    counts = np.bincount(shard, minlength=n_shards)
    e_max = int(counts.max()) if g.nnz else 0
    e_max = max(_round_up(max(e_max, 128), 128), 128)
    if pad_edges_to is not None:
        assert pad_edges_to >= e_max
        e_max = pad_edges_to

    rows_local = np.full((n_shards, e_max), rows_per_shard - 1, dtype=np.int32)
    cols = np.zeros((n_shards, e_max), dtype=np.int32)
    vals = np.zeros((n_shards, e_max), dtype=np.float32)
    # position within shard: nnz are row-sorted so per-shard order holds
    shard_start = np.zeros(n_shards + 1, dtype=np.int64)
    np.cumsum(counts, out=shard_start[1:])
    pos = np.arange(g.nnz, dtype=np.int64) - shard_start[shard]
    rows_local[shard, pos] = (rows - shard * rows_per_shard).astype(np.int32)
    cols[shard, pos] = g.indices
    vals[shard, pos] = g.data
    return ShardedGraph(
        rows_local=rows_local,
        cols=cols,
        vals=vals,
        n_rows=n, n_cols=g.shape[1],
        rows_per_shard=rows_per_shard, n_shards=n_shards, nnz=g.nnz,
    )


def band_degree_sort_order(g: CSRGraph, rows_per_shard: int) -> np.ndarray:
    """perm[new]=old sorting rows by degree descending WITHIN each row band.

    Composes the single-chip ELL fill win with the multi-chip halo win:
    the ablation (examples/ablate_reorder.py) shows a GLOBAL degree sort
    destroys Rabbit's community locality (halo exchange 0.26 -> 0.81 on
    the pubmed-size graph) while in-band sorting leaves every row in its
    band — boundary sets merely relabel — and still makes the per-shard
    ELL windows degree-homogeneous. Apply AFTER the community reorder and
    BEFORE shard_graph_by_rows/tiling.
    """
    n = g.shape[0]
    deg = np.diff(g.indptr)
    perm = np.empty(n, dtype=np.int32)
    for lo in range(0, n, rows_per_shard):
        hi = min(n, lo + rows_per_shard)
        order = np.argsort(-deg[lo:hi], kind="stable")
        perm[lo:hi] = lo + order
    return perm


def pad_rows(x: np.ndarray, sg: ShardedGraph, fill=0) -> np.ndarray:
    """Pad a per-row array (features/labels/masks) to the sharded row count."""
    n_pad = sg.n_rows_padded
    if x.shape[0] == n_pad:
        return x
    pad_width = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width, constant_values=fill)
