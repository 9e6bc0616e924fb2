"""Pallas SpMM over the packed EllAdj format — the fast path.

out = A @ x in two stages (see gcn_tpu/tile/ell.py for the measurements
that shaped this):

  1. gather+scale+stride-sum in XLA:
         products[s] = sum_j x[cols[s, j]] * vals[s, j]      (j < P strides)
     P independent row gathers feeding one elementwise sum — XLA fuses the
     whole thing into one loop, so the P-stride dimension never
     materializes. The row gather is the hardware-practical sparse
     primitive on TPU (~4.5 ns/row on v5e, per-index bound regardless of
     locality or dtype; a Pallas per-row DMA costs ~560 ns/row, 120x
     worse — measured).
  2. reduce over pass-blocks. Default (single row chunk): the GROUPED-XLA
     reduce — equal-pass-count window spans (EllAdj.spans) turn the pass
     reduction into a static reshape+sum that XLA fuses with stage 1's
     gather, so the products slab never materializes (measured 1.19x over
     the Pallas path on arxiv-k32: 7.9 -> 6.6 ms, within ~13% of the raw
     chained-gather rate from examples/bench_gather.py). Row-chunked huge
     graphs use the Pallas VMEM-revisit kernel below, whose products
     buffer is explicitly bounded per chunk — pure VPU adds, exact f32.

This is the TPU counterpart of the reference's flexspmm kernel family
(flexspmm.cu:17-498), with its k-specialized variants (flexspmm.cu:510-541)
replaced by the k_pad packing parameter. The backward pass runs the same
kernel on the transpose arrays (symmetric A aliases them — the
gcn6.py:49-62 fast path, made correct for general A). The edge-weight
cotangent is a real SDDMM over the ELL layout (dvals[slot] =
<g[out_row(slot)], x[cols[slot]]>, masked at padding slots) so adjacency
values are trainable, matching the coo path (ops/spmm.py); when nothing
differentiates w.r.t. vals — the normal GCN loop, where the normalized
adjacency is a constant — XLA dead-code-eliminates the SDDMM, so the hot
loop pays nothing for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcn_tpu.tile.ell import EllAdj

_VMEM_LIMIT = 100 * 1024 * 1024

# The hub-span threshold lives on the adjacency (EllAdj.span_pass_limit,
# default 16, env GCN_TPU_SPAN_LIMIT; 0 = unlimited serving config) —
# see tile/ell.py for the measured compile/perf frontier.


def _reduce_kernel(win_ref, prod_ref, out_ref):
    blk = pl.program_id(0)
    first = jnp.logical_or(blk == 0, win_ref[blk] != win_ref[blk - 1])

    @pl.when(first)
    def _():
        out_ref[:] = prod_ref[:].astype(out_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += prod_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "k_pad", "n_rows"))
def _ell_reduce(win, products, *, r: int, k_pad: int, n_rows: int):
    """products: (num_blocks*R, k_pad) pass-block slabs -> (n_rows, k_pad)."""
    num_blocks = win.shape[0]
    num_windows = max(1, -(-n_rows // r))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((r, k_pad), lambda b, win: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, k_pad), lambda b, win: (win[b], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _reduce_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * r, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("arbitrary",),
        ),
        # CPU (tests / fake multi-device meshes) runs the interpreter.
        interpret=jax.default_backend() != "tpu",
    )(win, products)
    return out[:n_rows]


# XLA keeps a gather table fast while its lane-PADDED footprint
# (rows x 128 lanes x dtype bytes, regardless of k<=32) stays within the
# on-chip residency envelope (~100 MB measured: f32 tables cliff between
# n=169k/86MB and n=233k/119MB — examples/bench_gather.py). Packing q
# table rows per 128-lane row (gather row//q, then q masked lane-group
# selects) shrinks the footprint q-fold but adds ~2.5-3 ns/slot of
# fused-loop select work per extra group. The measured decision surface
# (chained SpMM, v5e, k_pad=32):
#   footprint <= budget        -> q=1 wins outright (1.9-2.9 ns/slot)
#   <= ~1.5x budget            -> plain only mildly degraded (5.9 ns at
#                                 reddit/119MB) and q=2 is a wash (6.8)
#                                 -> keep q=1
#   beyond                     -> plain collapses (24+ ns at 466k f32);
#                                 smallest q that fits wins: yelp bf16
#                                 q=2 5.2 ns (76.8 ms, 1.8x over q=4),
#                                 yelp f32 q=4 10.2 ns
# bf16 tables halve every footprint, so table_bf16 halves the q needed.
# Far past the envelope (q saturated at 4, e.g. synth-amazon 1.57M rows)
# the frequency-split two-table form is the measured winner: hot column
# prefix resident at envelope/2 + packed cold tail, 203.9 ms vs 215.7
# single-table bf16 q=4 on amazon k32 (tile/freq_split.py,
# results/freq_split_amazon.json); enable with adj_options
# {"freq_split": True} (train_gcn --freq-split).
_TABLE_BUDGET_BYTES = 100 * 1024 * 1024


def _pack_q(n_table_rows, k_pad, dtype):
    """Packing factor per the measured decision surface above."""
    dsize = 2 if dtype == jnp.bfloat16 else 4
    qmax = max(1, 128 // k_pad)

    def footprint(q):
        return -(-n_table_rows // q) * 128 * dsize

    if qmax == 1 or footprint(1) <= 1.5 * _TABLE_BUDGET_BYTES:
        return 1  # k_pad=128 rows already fill the lane dim: no packing
    q = 2
    while q < qmax and footprint(q) > _TABLE_BUDGET_BYTES:
        q *= 2
    return q


def _packed_gather_stride_sum(cols, vals, x, k_pad, q):
    n = x.shape[0]
    npad = -(-n // q) * q
    xq = jnp.pad(x, ((0, npad - n), (0, 0))).reshape(npad // q, q * k_pad)
    p = cols.shape[1]
    acc = None
    for j in range(p):
        c = cols[:, j, :].reshape(-1)
        v = vals[:, j, :].reshape(-1).astype(jnp.float32)
        g = jnp.take(xq, c // q, axis=0).astype(jnp.float32)
        m = c % q
        part = None
        for mm in range(q):
            t = jnp.where(m == mm, v, 0)[:, None] * g[:, mm * k_pad:
                                                      (mm + 1) * k_pad]
            part = t if part is None else part + t
        acc = part if acc is None else acc + part
    return acc


def _gather_stride_sum(cols, vals, x, k_pad, out_dtype=jnp.float32):
    """sum_j x[cols[:, j, :]] * vals[:, j, :] -> (num_blocks*R, k_pad)."""
    k = x.shape[1]
    if k < k_pad:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
    q = _pack_q(x.shape[0], k_pad, x.dtype)
    if q > 1:
        return _packed_gather_stride_sum(cols, vals, x, k_pad, q).astype(
            out_dtype)
    p = cols.shape[1]
    # gather in the table dtype (that sets the traffic); multiply and
    # stride-accumulate in f32 (in-register, free under the fusion)
    acc = None
    for j in range(p):
        c = cols[:, j, :].reshape(-1)
        v = vals[:, j, :].reshape(-1).astype(jnp.float32)
        t = jnp.take(x, c, axis=0).astype(jnp.float32) * v[:, None]
        acc = t if acc is None else acc + t
    return acc.astype(out_dtype)


def _spmm_ell_impl(cols, vals, win, x, r, k_pad, n_rows, chunks=None,
                   products_bf16=False, spans=(), table_bf16=False,
                   span_limit=16):
    k = x.shape[1]
    pdt = jnp.bfloat16 if products_bf16 else jnp.float32
    if table_bf16:
        # round the gather table once: bf16 rows move 256 B instead of
        # 512 B and stay residency-fast to ~2x the f32 row count
        # (measured flat ~1.9-2.2 ns/row through n=233k where f32 is
        # 3x degraded — examples/bench_gather.py). Products stay f32.
        x = x.astype(jnp.bfloat16)
    if k > k_pad:
        # wide features: process in k_pad-column chunks
        parts = [
            _spmm_ell_impl(cols, vals, win, x[:, c:c + k_pad],
                           r, k_pad, n_rows, chunks, products_bf16,
                           spans, span_limit=span_limit)
            for c in range(0, k, k_pad)
        ]
        return jnp.concatenate(parts, axis=1)
    # Packed gather tables (q > 1) must NOT take the grouped-span path:
    # the grouped reshape+sum defeats the packed lane-select fusion
    # (measured 13.2 vs 6.4 ns/slot on synth-amazon bf16 q=4) — the
    # Pallas reduce keeps the packed gather loop pure.
    if spans and _pack_q(x.shape[0], k_pad, x.dtype) > 1:
        spans = ()
    if spans and chunks is not None and len(chunks) > 1:
        # Grouped spans materialize no products buffer (the pass
        # reduction fuses into the gather), so the row-chunk bound only
        # matters for merged-Pallas hub RUNS. Keep the span path — the
        # big-graph fast path since round 3 — unless some hub run's
        # products would exceed what the chunk plan was sized for.
        max_chunk = max(be - bs for bs, be, _, _ in chunks)
        run = 0
        max_run = 0
        for _, _, pw, ws, we in spans:
            if pw > span_limit:
                run += (we - ws) * pw
                max_run = max(max_run, run)
            else:
                run = 0
        if max_run > max_chunk:
            spans = ()
    if not spans and chunks is not None and len(chunks) > 1:
        # row chunks (window-aligned): bounds the gather-products buffer
        # to one chunk's slots however large the graph (tile/ell.py)
        outs = []
        for bs, be, ws, we in chunks:
            products = _gather_stride_sum(cols[bs:be], vals[bs:be], x,
                                          k_pad, pdt)
            rows = min((we - ws) * r, n_rows - ws * r)
            outs.append(_ell_reduce(win[bs:be] - ws, products, r=r,
                                    k_pad=k_pad, n_rows=rows))
        out = jnp.concatenate(outs, axis=0)
    elif spans:
        # Hybrid reduce. Grouped-XLA for low-pass-count spans (the vast
        # majority of windows on a degree-sorted graph): the pass
        # reduction is a static reshape+sum which XLA fuses with the
        # gather — no products materialization, no second dispatch
        # (measured 1.19x over all-Pallas on arxiv-k32). Contiguous runs
        # of hub spans (pw > span_limit) merge into Pallas revisit
        # regions: one grouped segment per distinct hub pass count blows
        # compile time (>400 s cold through the vjp+scan of a training
        # step), and the measured alternatives — 16-fold reshape+sum
        # (defeats the gather fusion, +0.9 ms) and 16-stream fold with
        # tiler pass rounding (+0.5 ms of hub padding) — both lose to
        # paying the hub region's small products round-trip here.
        outs = []
        run = []  # accumulating run of contiguous hub spans

        def flush_run():
            if not run:
                return
            b0, ws = run[0][0], run[0][3]
            b1, we = run[-1][1], run[-1][4]
            products = _gather_stride_sum(cols[b0:b1], vals[b0:b1], x,
                                          k_pad, pdt)
            rows = min((we - ws) * r, n_rows - ws * r)
            outs.append(_ell_reduce(win[b0:b1] - ws, products, r=r,
                                    k_pad=k_pad, n_rows=rows))
            run.clear()

        for span in spans:
            b0, b1, pw, ws, we = span
            if pw > span_limit:
                run.append(span)
                continue
            flush_run()
            prod = _gather_stride_sum(cols[b0:b1], vals[b0:b1], x,
                                      k_pad, pdt)
            outs.append(prod.reshape(we - ws, pw, r, k_pad)
                        .astype(jnp.float32).sum(axis=1)
                        .reshape((we - ws) * r, k_pad))
        flush_run()
        # trim window padding from the LAST piece only: slicing the full
        # concatenation by a few rows defeats fusion and re-copies the
        # whole output (~4% on arxiv)
        total = sum(o.shape[0] for o in outs)
        if total > n_rows:
            outs[-1] = outs[-1][:outs[-1].shape[0] - (total - n_rows)]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    else:
        products = _gather_stride_sum(cols, vals, x, k_pad, pdt)
        out = _ell_reduce(win, products, r=r, k_pad=k_pad, n_rows=n_rows)
    return out[:, :k] if k < k_pad else out


def _ell_sddmm(cols, vals, win, g, x, r, n_rows, chunks=None):
    """dvals[b, j, i] = <g[win[b]*r + i], x[cols[b, j, i]]>, 0 at padding.

    The scatter side of the forward layout read as a gather: each slot's
    output row is static (win[b]*r + lane), so the SDDMM is two row
    gathers and a lane dot — no scatter at all. Padding slots are masked
    by ``vals == 0`` so their cotangent matches the coo SDDMM, which only
    produces gradients at stored nnz. Caveat: a STORED edge whose weight
    is exactly 0.0 is indistinguishable from padding in this layout and
    also gets zero gradient (the coo path gives it the true cotangent);
    if you train adjacency weights through zero, use the coo
    representation (ell_adjacency warns when it sees explicit zeros).
    Intermediates are bounded twice: feature columns in 128-wide chunks,
    and blocks by the adjacency's row-chunk plan (``chunks``) — the same
    plan that bounds the forward products buffer — so huge row-chunked
    graphs with trainable adjacency values never materialize the full
    (num_blocks*r, k) gather at once.
    """
    num_blocks, p, rr = cols.shape
    k = x.shape[1]
    nw = max(1, -(-n_rows // r))
    gpad = jnp.pad(g, ((0, nw * r - n_rows), (0, 0)))
    if chunks is None or len(chunks) <= 1:
        chunks = ((0, num_blocks, 0, nw),)
    parts = []
    for bs, be, _, _ in chunks:
        nb = be - bs
        dv = jnp.zeros((nb, p, rr), dtype=jnp.float32)
        for c in range(0, k, 128):
            gblk = jnp.take(gpad[:, c:c + 128].reshape(nw, rr, -1),
                            win[bs:be], axis=0)       # (nb, r, kc)
            for j in range(p):
                xg = jnp.take(x[:, c:c + 128],
                              cols[bs:be, j, :].reshape(-1),
                              axis=0).reshape(nb, rr, -1)
                dv = dv.at[:, j, :].add(
                    jnp.sum(gblk.astype(jnp.float32)
                            * xg.astype(jnp.float32), axis=-1))
        parts.append(dv)
    dv = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return jnp.where(vals != 0, dv, 0.0).astype(vals.dtype)


def _hub_epilogue(out_virt, virt_map, n_hub, n_real):
    """Fold virtual hub-chunk rows back into real rows (hub splitting,
    tile/ell.py::_split_hub_rows): a sorted prefix segment-sum over
    ``virt_map`` plus an identity tail. Exact f32 adds; measured 0.16 ms
    marginal on arxiv-k32 (14.5k virtual rows)."""
    if n_hub == 0:
        return out_virt
    n_virt_hub = virt_map.shape[0]
    hub = jax.ops.segment_sum(out_virt[:n_virt_hub], virt_map,
                              num_segments=n_hub,
                              indices_are_sorted=True)
    rest = out_virt[n_virt_hub:n_virt_hub + (n_real - n_hub)]
    return jnp.concatenate([hub, rest], axis=0)


@jax.custom_vjp
def spmm_ell(adj: EllAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x over the EllAdj format; differentiable in x and in
    adj.vals (real SDDMM cotangent — see module docstring)."""
    out = _spmm_ell_impl(adj.cols, adj.vals, adj.win, x,
                         adj.r, adj.k_pad, adj.row_space, adj.chunks,
                         adj.products_bf16, adj.spans, adj.table_bf16,
                         adj.span_pass_limit)
    return _hub_epilogue(out, adj.virt_map, adj.n_hub, adj.n_rows)


def _spmm_ell_fwd(adj, x):
    # x is saved for the SDDMM; when nothing uses d_adj.vals, XLA drops
    # both the residual read and the SDDMM computation.
    return spmm_ell(adj, x), (adj, x)


def _spmm_ell_bwd(res, g):
    adj, x = res
    dx = _spmm_ell_impl(adj.t_cols, adj.t_vals, adj.t_win, g,
                        adj.r, adj.k_pad, adj.t_row_space, adj.t_chunks,
                        adj.products_bf16, adj.t_spans, adj.table_bf16,
                        adj.span_pass_limit).astype(x.dtype)
    dx = _hub_epilogue(dx, adj.t_virt_map, adj.t_n_hub, adj.n_cols)
    if adj.n_hub:
        # SDDMM output rows live in the VIRTUAL row space: expand g
        g_sddmm = jnp.concatenate(
            [jnp.take(g, adj.virt_map, axis=0), g[adj.n_hub:]], axis=0)
    else:
        g_sddmm = g
    dvals = _ell_sddmm(adj.cols, adj.vals, adj.win, g_sddmm, x, adj.r,
                       adj.row_space, adj.chunks)

    def _zt(a):
        return (None if a is None
                else np.zeros(a.shape, dtype=jax.dtypes.float0))

    d_adj = EllAdj(
        cols=_zt(adj.cols), vals=dvals, win=_zt(adj.win),
        t_cols=_zt(adj.t_cols), t_vals=jnp.zeros_like(adj.t_vals),
        t_win=_zt(adj.t_win), n_rows=adj.n_rows,
        n_cols=adj.n_cols, nnz=adj.nnz, r=adj.r, k_pad=adj.k_pad,
        symmetric=adj.symmetric, chunks=adj.chunks, t_chunks=adj.t_chunks,
        products_bf16=adj.products_bf16, spans=adj.spans,
        t_spans=adj.t_spans, table_bf16=adj.table_bf16,
        span_pass_limit=adj.span_pass_limit,
        virt_map=_zt(adj.virt_map), t_virt_map=_zt(adj.t_virt_map),
        n_virt=adj.n_virt, n_hub=adj.n_hub, t_n_virt=adj.t_n_virt,
        t_n_hub=adj.t_n_hub,
    )
    return d_adj, dx


spmm_ell.defvjp(_spmm_ell_fwd, _spmm_ell_bwd)
