"""SpMM: sparse normalized adjacency x dense features.

This is the hot op of GCN training (SURVEY.md §0). Strategies:

  * dense  — ``A @ X`` on the MXU (DenseAdj).
  * coo    — XLA gather + sorted segment-sum (CooAdj); the vendor-baseline
    analogue of the reference's cuSPARSE path (cuspmm.cu:23-68).
  * ell    — packed-ELL kernel (EllAdj), the flagship TPU counterpart of
    the reference's flexspmm persistent-block kernels
    (flexspmm.cu:17-498). See gcn_tpu.ops.ell_spmm.
  * panel  — one-hot MXU alternate (PanelAdj); demoted to a test-side
    reference implementation that cross-checks the ELL kernel
    (docs/ROADMAP.md), still dispatchable here for those tests.

All strategies share one differentiable entry point, ``spmm(adj, x)``, with a
custom VJP:
    dX     = A^T @ g          (uses the stored transpose; for symmetric A the
                               transpose aliases the forward arrays — the
                               invariant the reference silently assumes when
                               reusing its forward kernel in backward,
                               gcn6.py:49-62)
    dvals  = (g X^T) at nnz   (SDDMM — makes edge weights trainable)
"""

from __future__ import annotations

import dataclasses as _dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.ops.adjacency import CooAdj, DenseAdj


def _int_zero_tangent(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


def _segment_spmm(rows, cols, vals, x, m):
    """out[r] = sum_e [rows[e]==r] vals[e] * x[cols[e]] via sorted segment sum."""
    gathered = jnp.take(x, cols, axis=0) * vals[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, rows, num_segments=m, indices_are_sorted=True
    )


@jax.custom_vjp
def _spmm_coo(adj: CooAdj, x: jnp.ndarray) -> jnp.ndarray:
    return _segment_spmm(adj.rows, adj.cols, adj.vals, x, adj.n_rows)


def _spmm_coo_fwd(adj, x):
    return _spmm_coo(adj, x), (adj, x)


def _spmm_coo_bwd(res, g):
    adj, x = res
    # dX = A^T g — another sorted segment-sum over the transpose layout.
    dx = _segment_spmm(adj.t_rows, adj.t_cols, adj.t_vals, g, adj.n_cols)
    dx = dx.astype(x.dtype)
    # dvals (SDDMM): dval[e] = <g[row_e], x[col_e]>.
    dvals = jnp.sum(
        jnp.take(g, adj.rows, axis=0) * jnp.take(x, adj.cols, axis=0), axis=-1
    ).astype(adj.vals.dtype)
    d_adj = CooAdj(
        rows=_int_zero_tangent(adj.rows),
        cols=_int_zero_tangent(adj.cols),
        vals=dvals,
        t_rows=_int_zero_tangent(adj.t_rows),
        t_cols=_int_zero_tangent(adj.t_cols),
        t_vals=jnp.zeros_like(adj.t_vals),
        n_rows=adj.n_rows,
        n_cols=adj.n_cols,
        nnz=adj.nnz,
        symmetric=adj.symmetric,
    )
    return d_adj, dx


_spmm_coo.defvjp(_spmm_coo_fwd, _spmm_coo_bwd)


@jax.tree_util.register_dataclass
@_dataclasses.dataclass(frozen=True)
class TwoHopAdj:
    """Factored operator A = A1 @ A2 applied as two SpMMs.

    The hypergraph Laplacian-like G factors as (Dv^-1/2 H W De^-1) @
    (H^T Dv^-1/2) — see graph.hypergraph.generate_G_factors; the factors
    carry ~k entries per hyperedge where the materialized G carries ~k^2
    per vertex. Works with any adjacency representation for each factor.
    """

    a1: object
    a2: object

    @property
    def shape(self):
        return (self.a1.shape[0], self.a2.shape[1])


def spmm(adj, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable sparse @ dense: returns ``A @ X`` of shape (m, k)."""
    shape = getattr(adj, "shape", None)
    if (shape is not None and hasattr(x, "shape") and x.ndim == 2
            and x.shape[0] != shape[1]):
        raise ValueError(
            f"spmm shape mismatch: adjacency is {shape}, features have "
            f"{x.shape[0]} rows (expected {shape[1]})")
    if isinstance(adj, TwoHopAdj):
        return spmm(adj.a1, spmm(adj.a2, x))
    if isinstance(adj, DenseAdj):
        return jnp.dot(adj.mat, x, preferred_element_type=x.dtype)
    if isinstance(adj, CooAdj):
        return _spmm_coo(adj, x)
    # Tiled formats — imported lazily to avoid a package cycle.
    from gcn_tpu.tile.ell import EllAdj
    from gcn_tpu.tile.format import PanelAdj
    from gcn_tpu.tile.freq_split import FreqSplitAdj

    if isinstance(adj, EllAdj):
        from gcn_tpu.ops.ell_spmm import spmm_ell

        return spmm_ell(adj, x)
    if isinstance(adj, FreqSplitAdj):
        from gcn_tpu.tile.freq_split import spmm_ell_freq

        return spmm_ell_freq(adj, x)
    if isinstance(adj, PanelAdj):
        from gcn_tpu.ops.panel_spmm import spmm_panel

        return spmm_panel(adj, x)
    raise TypeError(f"unsupported adjacency representation: {type(adj)}")


# One shared wrapper so every equal-shape chunk reuses one compiled
# executable — constructing jax.jit(spmm) per chunk would retrace and
# recompile the same program ~nfeat/k_pad times per hoist.
_jit_spmm = jax.jit(spmm)


def hoist_spmm(adj, x: jnp.ndarray, chunk: int = None) -> jnp.ndarray:
    """Aggregate ``A @ x`` once, in EAGER column chunks.

    For training-invariant hoists over wide feature matrices (the gcn2
    trick): one jit over all of X materializes every chunk's gather
    products simultaneously (OOM at reddit/yelp scale), so each chunk is
    dispatched eagerly and only one chunk's products are ever live.
    """
    if chunk is None:
        chunk = getattr(adj, "k_pad", 32)
    parts = [_jit_spmm(adj, x[:, c:c + chunk])
             for c in range(0, x.shape[1], chunk)]
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
