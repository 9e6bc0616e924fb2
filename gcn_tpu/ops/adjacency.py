"""Device-side adjacency representations.

The host currency is ``gcn_tpu.graph.CSRGraph`` (numpy). Before training, the
adjacency is lowered to one of several device representations, each paired
with an SpMM strategy in ``gcn_tpu.ops.spmm``:

  * ``DenseAdj``  — materialized dense matrix; MXU matmul. Golden reference
    and fastest choice for small graphs (Cora/Citeseer-scale).
  * ``CooAdj``    — row-sorted COO, edge count padded to a lane multiple;
    gather + sorted segment-sum. The XLA-native baseline playing the role of
    the reference's cuSPARSE path (cuspmm.cu:23-68).
  * ``PanelAdj``  — row-panel segment format for the Pallas kernel
    (gcn_tpu.tile), the TPU analogue of the reference's flexspmm segment
    format (tile.cu:104-169). Defined in gcn_tpu.tile.format.

All representations are JAX pytrees so they can flow through jit/shard_map.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.graph.csr import CSRGraph

# Pad edge counts to a multiple of this so every strategy sees lane-aligned
# shapes and recompilation is bounded (one program per padded size bucket).
EDGE_PAD = 1024


def _pad_to(x: np.ndarray, size: int, fill) -> np.ndarray:
    if x.shape[0] == size:
        return x
    out = np.full((size,), fill, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "cols", "vals", "t_rows", "t_cols", "t_vals"],
    meta_fields=["n_rows", "n_cols", "nnz", "symmetric"],
)
@dataclasses.dataclass(frozen=True)
class CooAdj:
    """Row-sorted COO adjacency, padded to EDGE_PAD.

    Padding entries carry ``vals == 0`` and in-range indices (last row /
    column 0) so they contribute nothing without relying on out-of-bounds
    scatter semantics.

    ``t_*`` hold the transpose in the same layout (sorted by transpose-row),
    used for the backward pass dX = A^T g. For symmetric A they alias the
    forward arrays (the optimization the reference hardcodes by reusing its
    forward kernel in backward, gcn6.py:49-62 — here it is an explicit,
    checked property rather than an assumption).
    """

    rows: jnp.ndarray  # int32[E_pad]
    cols: jnp.ndarray  # int32[E_pad]
    vals: jnp.ndarray  # float32[E_pad]
    t_rows: jnp.ndarray
    t_cols: jnp.ndarray
    t_vals: jnp.ndarray
    n_rows: int
    n_cols: int
    nnz: int
    symmetric: bool

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mat"],
    meta_fields=["nnz"],
)
@dataclasses.dataclass(frozen=True)
class DenseAdj:
    """Dense adjacency (small graphs); SpMM is a plain MXU matmul."""

    mat: jnp.ndarray
    nnz: int

    @property
    def n_rows(self):
        return self.mat.shape[0]

    @property
    def n_cols(self):
        return self.mat.shape[1]

    @property
    def shape(self):
        return self.mat.shape


def _coo_arrays(g: CSRGraph, pad_to: Optional[int] = None):
    rows, cols, vals = g.to_coo()  # already row-major, cols ascending
    e = rows.shape[0]
    e_pad = pad_to if pad_to is not None else max(EDGE_PAD, -(-e // EDGE_PAD) * EDGE_PAD)
    pad_row = max(g.shape[0] - 1, 0)
    rows = _pad_to(rows.astype(np.int32), e_pad, pad_row)
    cols = _pad_to(cols.astype(np.int32), e_pad, 0)
    vals = _pad_to(vals.astype(np.float32), e_pad, 0.0)
    return rows, cols, vals, e


def coo_adjacency(g: CSRGraph, *, symmetric: Optional[bool] = None) -> CooAdj:
    if symmetric is None:
        symmetric = g.shape[0] == g.shape[1] and g.is_symmetric()
    rows, cols, vals, e = _coo_arrays(g)
    rows, cols, vals = jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)
    if symmetric:
        # alias the same device buffers: backward reuses the forward arrays
        t_rows, t_cols, t_vals = rows, cols, vals
    else:
        tr, tc, tv, _ = _coo_arrays(g.transpose(), pad_to=rows.shape[0])
        t_rows, t_cols, t_vals = jnp.asarray(tr), jnp.asarray(tc), jnp.asarray(tv)
    return CooAdj(
        rows=rows,
        cols=cols,
        vals=vals,
        t_rows=t_rows,
        t_cols=t_cols,
        t_vals=t_vals,
        n_rows=g.shape[0],
        n_cols=g.shape[1],
        nnz=e,
        symmetric=bool(symmetric),
    )


def dense_adjacency(g: CSRGraph) -> DenseAdj:
    return DenseAdj(mat=jnp.asarray(g.to_dense()), nnz=g.nnz)


def device_adjacency(g: CSRGraph, kind: str = "auto", **kwargs):
    """Lower a host CSRGraph to a device representation.

    kind: "dense" | "coo" | "ell" | "auto". "auto" picks dense while the
    materialized matrix stays within an 8192x8192-equivalent footprint
    (256 MB f32) and coo beyond it — the threshold is AREA-based, not
    max-dimension, so rectangular operators (hypergraph factors, halo
    blocks) with one long axis but a small dense footprint still take
    the MXU path: a 100k x 64 factor is 25 MB dense and one streaming
    matmul, where a gather kernel would touch every nnz individually.
    Square graphs behave exactly as before (n <= 8192 -> dense).
    "panel" (the one-hot MXU alternate) is demoted to a test-side
    reference implementation — strictly dominated by "ell" on every
    measurement (docs/ROADMAP.md); tests build it via
    gcn_tpu.tile.panel_adjacency directly.
    """
    if kind == "auto":
        kind = "dense" if g.shape[0] * g.shape[1] <= 8192 ** 2 else "coo"
    if kwargs.get("freq_split") and kind != "ell":
        raise ValueError(
            f"freq_split requires kind='ell' (resolved kind is {kind!r})")
    if kind == "dense":
        return dense_adjacency(g)
    if kind == "coo":
        return coo_adjacency(g, **kwargs)
    if kind == "ell":
        from gcn_tpu.tile import ell_adjacency, ell_adjacency_freq

        if kwargs.pop("freq_split", False):
            # frequency-split two-table form for the >1M-row gather
            # regime (tile/freq_split.py); its parts are rectangular, so
            # the symmetric-alias option does not apply
            kwargs.pop("symmetric", None)
            return ell_adjacency_freq(g, **kwargs)
        return ell_adjacency(g, **kwargs)
    if kind == "panel":
        raise ValueError(
            "'panel' is a test-side reference implementation only; use "
            "'ell' (or build via gcn_tpu.tile.panel_adjacency directly)")
    raise ValueError(f"unknown adjacency kind: {kind!r}")
