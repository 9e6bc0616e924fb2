"""CSR -> PanelAdj tiler (vectorized numpy reference implementation).

Plays the role of the reference's csr2tile (tile.cu:104-169) for the TPU
format described in gcn_tpu.tile.format. A native C++ implementation can
replace this for very large graphs; the numpy version is fully vectorized
(no per-nnz Python loops) and handles the benchmark roster in well under a
second.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gcn_tpu.graph.csr import CSRGraph
from gcn_tpu.tile.format import BLOCK_PAD, DEFAULT_NB, DEFAULT_R, PanelAdj


def _tile_arrays(g: CSRGraph, r: int, nb: int):
    n = g.shape[0]
    e = g.nnz
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
    win = rows // r                                   # window of each nnz
    num_windows = (n + r - 1) // r

    counts = np.bincount(win, minlength=num_windows)  # nnz per window
    # Every window gets >= 1 block (possibly all padding): the kernel writes
    # an output block only on visit, so unvisited windows would be garbage.
    blocks_per_win = np.maximum(1, -(-counts // nb))  # ceil
    block_offset = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(blocks_per_win, out=block_offset[1:])
    num_blocks = int(block_offset[-1])
    num_blocks_pad = max(BLOCK_PAD, -(-num_blocks // BLOCK_PAD) * BLOCK_PAD)

    win_start = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(counts, out=win_start[1:])
    ordinal = np.arange(e, dtype=np.int64) - win_start[win]  # pos within window
    dest_block = block_offset[win] + ordinal // nb
    dest_slot = ordinal % nb

    cols = np.zeros((num_blocks_pad, nb), dtype=np.int32)
    vals = np.zeros((num_blocks_pad, nb), dtype=np.float32)
    local_row = np.full((num_blocks_pad, nb), r, dtype=np.int32)  # pad -> R
    row_base = np.zeros(num_blocks_pad, dtype=np.int32)

    cols[dest_block, dest_slot] = g.indices
    vals[dest_block, dest_slot] = g.data
    local_row[dest_block, dest_slot] = (rows - win * r).astype(np.int32)
    # window base per block; trailing pad blocks re-visit the last window
    # (all-padding, so they only re-accumulate zeros)
    blk_win = np.repeat(np.arange(num_windows, dtype=np.int64), blocks_per_win)
    row_base[:num_blocks] = (blk_win * r).astype(np.int32)
    row_base[num_blocks:] = ((num_windows - 1) * r) if num_windows else 0
    return cols, vals, local_row, row_base


def panel_adjacency(
    g: CSRGraph,
    *,
    r: int = DEFAULT_R,
    nb: int = DEFAULT_NB,
    symmetric: Optional[bool] = None,
) -> PanelAdj:
    """Tile a CSR graph into the PanelAdj device format."""
    assert r % 8 == 0, "row window must be sublane-aligned"
    assert nb % 128 == 0, "block size must be lane-aligned"
    if symmetric is None:
        symmetric = g.shape[0] == g.shape[1] and g.is_symmetric()

    cols, vals, local_row, row_base = _tile_arrays(g, r, nb)
    cols_j = jnp.asarray(cols)
    vals_j = jnp.asarray(vals)
    lrow_j = jnp.asarray(local_row)
    base_j = jnp.asarray(row_base)
    if symmetric:
        t = (cols_j, vals_j, lrow_j, base_j)
    else:
        tc, tv, tl, tb = _tile_arrays(g.transpose(), r, nb)
        t = (jnp.asarray(tc), jnp.asarray(tv), jnp.asarray(tl), jnp.asarray(tb))

    return PanelAdj(
        cols=cols_j, vals=vals_j, local_row=lrow_j, row_base=base_j,
        t_cols=t[0], t_vals=t[1], t_local_row=t[2], t_row_base=t[3],
        n_rows=g.shape[0], n_cols=g.shape[1], nnz=g.nnz,
        r=r, nb=nb, symmetric=bool(symmetric),
    )
