"""Pallas row-window SpMM over the PanelAdj format.

NOTE: demoted to a TEST-SIDE REFERENCE IMPLEMENTATION. Superseded by the
packed-ELL path (gcn_tpu.ops.ell_spmm) — measured strictly slower
(one-hot MXU scatter + per-backward SDDMM vs free fixed-stride adds).
Not reachable through device_adjacency(); tests build PanelAdj directly
(gcn_tpu.tile.panel_adjacency) to cross-check the ELL kernel against an
independent formulation. Do not grow this surface.

TPU counterpart of the reference's flexspmm kernel family
(flexspmm.cu:17-498). The CUDA design — persistent warps claiming 128-nnz
segments off per-SM atomic work queues, scalar FMA loops, atomicAdd for rows
split across segments — maps onto TPU hardware as:

  * work distribution  -> the sequential Pallas grid (one core, DMA-pipelined
    blocks); no queues, no stealing, no atomics (SURVEY.md §2d).
  * per-warp FMA loops -> a one-hot MXU matmul per block:
        out[window] += onehot(local_row) @ (vals * x[cols])
    where onehot is (R, NB) and the product panel is (NB, k). Padding slots
    carry local_row == R which one-hots to zero — replacing the reference's
    MSB row flags and sentinel rows (tile.cu:79-96).
  * k-specialized kernel variants (flexspmm.cu:510-541) -> one kernel: the
    MXU tiles k internally, and XLA pads lanes; blocks are (NB, k) for any k.

The neighbor gather x[cols] currently runs in XLA (jnp.take) feeding the
kernel; Mosaic exposes no arbitrary-size VMEM gather (tpu.dynamic_gather is
single-(8,128)-tile only), so fusing the gather requires the windowed
col-sorted layout — the planned v2 of this kernel.

The output buffer stays fully VMEM-resident across the whole grid
(feature-row-major (n_pad, k)), which bounds supported n*k at VMEM size;
see `vmem_bytes_needed`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_tpu.tile.format import PanelAdj

_VMEM_LIMIT = 120 * 1024 * 1024

# Matmul algorithm for the one-hot scatter contraction (Mosaic supports only
# DEFAULT and HIGHEST inside kernels):
#   "HIGHEST" — 6-pass f32-faithful (parity testing; the default)
#   "DEFAULT" — 1-pass bf16 (products truncated to 8 mantissa bits; fine for
#               bf16 training runs)
_PRECISION = "HIGHEST"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def vmem_bytes_needed(n_rows: int, k: int, nb: int) -> int:
    # out buffer dominates; lanes pad to 128, sublanes to 8.
    return _round_up(n_rows, 8) * _round_up(k, 128) * 4


def _scatter_kernel(r: int, win_ref, lrow_ref, prod_ref, out_ref):
    """One grid step: out[window(b)] += onehot(local_row) @ products.

    The output block is selected by the scalar-prefetched window index, so
    consecutive blocks of the same row window accumulate in VMEM and the
    window is written back exactly once (the Pallas revisiting pattern) —
    no giant resident output buffer, no dynamic-slice read-modify-write.
    """
    b = pl.program_id(0)
    first_visit = jnp.logical_or(b == 0, win_ref[b] != win_ref[b - 1])

    lr = lrow_ref[0, 0, :]  # (NB,) int32 in [0, R]; R == padding
    nb = lr.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (r, nb), 0) == lr[None, :]
    ).astype(prod_ref.dtype)
    # The one-hot side is exactly representable at any precision; see
    # _PRECISION for the accuracy/speed trade (default TPU 1-pass bf16
    # truncates the products to 8 mantissa bits).
    seg = jnp.dot(onehot, prod_ref[:], preferred_element_type=jnp.float32,
                  precision=getattr(jax.lax.Precision, _PRECISION))

    @pl.when(first_visit)
    def _():
        out_ref[:] = seg.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(first_visit))
    def _():
        out_ref[:] += seg.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "n_rows"))
def _panel_scatter(row_base, local_row, products, *, r: int, n_rows: int):
    """products: (num_blocks*NB, k) gathered+weighted values in block order.

    Requires row_base to be nondecreasing with every row window covered by
    at least one block (the tiler guarantees both: empty windows still get
    zero... see note below) — otherwise rows of untouched windows would hold
    garbage. The tiler emits at least one (possibly all-padding) block per
    window so every output block is visited.
    """
    num_blocks, nb = local_row.shape
    k = products.shape[-1]
    n_pad = _round_up(n_rows, max(r, 8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, nb), lambda b, win: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k), lambda b, win: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, k), lambda b, win: (win[b], 0),
                               memory_space=pltpu.VMEM),
    )
    window = row_base // r
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary",),
        ),
        # CPU (tests / fake multi-device meshes) runs the interpreter.
        interpret=jax.default_backend() != "tpu",
    )(window, local_row[:, None, :], products)
    return out[:n_rows]


def _gather_products(cols, vals, x):
    flat_cols = cols.reshape(-1)
    flat_vals = vals.reshape(-1)
    return jnp.take(x, flat_cols, axis=0) * flat_vals[:, None].astype(x.dtype)


def _spmm_panel_impl(cols, vals, local_row, row_base, x, r, n_rows):
    products = _gather_products(cols, vals, x)
    return _panel_scatter(row_base, local_row, products, r=r, n_rows=n_rows)


@jax.custom_vjp
def spmm_panel(adj: PanelAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x over the PanelAdj format; differentiable in x and vals."""
    return _spmm_panel_impl(adj.cols, adj.vals, adj.local_row, adj.row_base,
                            x, adj.r, adj.n_rows)


def _spmm_panel_fwd(adj, x):
    return spmm_panel(adj, x), (adj, x)


def _spmm_panel_bwd(res, g):
    adj, x = res
    dx = _spmm_panel_impl(adj.t_cols, adj.t_vals, adj.t_local_row,
                          adj.t_row_base, g, adj.r, adj.n_cols).astype(x.dtype)
    # dvals (SDDMM): dval[e] = <g[row_e], x[col_e]>; row = row_base + local_row
    rows = jnp.minimum(
        adj.row_base[:, None] + adj.local_row, adj.n_rows - 1
    ).reshape(-1)
    gathered_g = jnp.take(g, rows, axis=0)
    gathered_x = jnp.take(x, adj.cols.reshape(-1), axis=0)
    dvals = jnp.sum(gathered_g * gathered_x, axis=-1).reshape(adj.vals.shape)
    dvals = jnp.where(adj.local_row < adj.r, dvals, 0.0).astype(adj.vals.dtype)

    def _zt(a):
        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    d_adj = PanelAdj(
        cols=_zt(adj.cols), vals=dvals, local_row=_zt(adj.local_row),
        row_base=_zt(adj.row_base), t_cols=_zt(adj.t_cols),
        t_vals=jnp.zeros_like(adj.t_vals), t_local_row=_zt(adj.t_local_row),
        t_row_base=_zt(adj.t_row_base), n_rows=adj.n_rows, n_cols=adj.n_cols,
        nnz=adj.nnz, r=adj.r, nb=adj.nb, symmetric=adj.symmetric,
    )
    return d_adj, dx


spmm_panel.defvjp(_spmm_panel_fwd, _spmm_panel_bwd)
