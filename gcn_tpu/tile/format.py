"""The TPU row-window segment format (PanelAdj).

TPU-native re-design of the reference's segment format (tile.cu:104-169,
SURVEY.md §2c). The reference tiles the reordered CSR into 8-row panels cut
into ~128-nnz segments, statically bucketed per SM with an atomic
work-stealing tail. On TPU none of that machinery survives contact with the
hardware model — a Pallas grid runs *sequentially* on the core with DMA
pipelining, so:

  * SM buckets / work stealing  -> nothing: sequential grid is load-balanced
    by construction (SURVEY.md §2d).
  * atomicAdd for split rows (the segVoMap MSB flag, tile.cu:79-91)
    -> nothing: consecutive grid steps may accumulate into the same
    VMEM-resident output window without races.
  * float32-encoded column ids (tile.cu:67, quirk §3.6.3) -> int32 planes.

Format: nnz in CSR order, chopped into fixed-size blocks of ``NB`` entries.
Every block's rows live inside one aligned window of ``R`` rows (blocks are
cut at window boundaries), so the kernel can accumulate a block's partial
sums into ``out[window]`` with a one-hot MXU matmul — the TPU replacement
for flexspmm's per-warp scalar FMA loops (flexspmm.cu:96-183).

Arrays (all padded to whole blocks; pad entries have val=0, col=0,
local_row=R which one-hots to nothing):

  cols      int32[num_blocks, NB]   global column of each nnz
  vals      f32[num_blocks, NB]     edge weight
  local_row int32[num_blocks, NB]   row - window_base, in [0, R); R = pad
  row_base  int32[num_blocks]       window base row (R-aligned)

``num_blocks`` is padded to a multiple of BLOCK_PAD so recompilation is
bounded across graphs of similar size.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# Defaults: R matches the MXU tile (one-hot scatter (R,NB)@(NB,k) runs at
# full sublane utilization when R=128); NB=512 amortizes per-block overhead
# at <=15% padding for avg-degree>=10 graphs.
DEFAULT_R = 128
DEFAULT_NB = 512
BLOCK_PAD = 16


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols", "vals", "local_row", "row_base",
                 "t_cols", "t_vals", "t_local_row", "t_row_base"],
    meta_fields=["n_rows", "n_cols", "nnz", "r", "nb", "symmetric"],
)
@dataclasses.dataclass(frozen=True)
class PanelAdj:
    """Row-window block-segment adjacency (see module docstring).

    ``t_*`` mirror the forward arrays for the transpose (backward dX = A^T g);
    for symmetric A they alias the forward arrays.
    """

    cols: jnp.ndarray        # int32[num_blocks, NB]
    vals: jnp.ndarray        # f32[num_blocks, NB]
    local_row: jnp.ndarray   # int32[num_blocks, NB]
    row_base: jnp.ndarray    # int32[num_blocks]
    t_cols: jnp.ndarray
    t_vals: jnp.ndarray
    t_local_row: jnp.ndarray
    t_row_base: jnp.ndarray
    n_rows: int
    n_cols: int
    nnz: int
    r: int
    nb: int
    symmetric: bool

    @property
    def num_blocks(self) -> int:
        return self.cols.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def pad_fraction(self) -> float:
        """Fraction of stored entries that are padding."""
        total = self.num_blocks * self.nb
        return 1.0 - self.nnz / total if total else 0.0
