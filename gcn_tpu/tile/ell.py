"""Degree-sorted packed-stride ELL format (EllAdj) — the fast SpMM path.

TPU-native successor to the reference's segment format (tile.cu:104-169).
Design rationale, from measurements on TPU v5e:

  * XLA's row gather (`jnp.take`) is **per-gathered-row bound**, and every
    gathered row moves a full 128-lane (512 B for f32) tile regardless of
    the feature width k — so at k=32 three quarters of the gather traffic
    is lane padding. The rate is ~2.2-2.9 ns/row f32 while the table is
    residency-fast, cliffing ~3x between n=169k and n=233k; bf16 tables
    hold ~1.9-2.2 ns/row with no cliff through 233k. All rates are
    reproduced by the committed chained-feedback microbenchmark
    (examples/bench_gather.py -> results/gather_microbench.json) — the
    same protocol backs bench.py's in-situ `roofline_pct`.
  * Column order does not affect gather speed (sorted == random), so the
    vertex order is free to serve the *scatter* side.
  * XLA's `segment_sum` scatter is catastrophically slow (~17 ns/edge); a
    Pallas kernel owns the reduction. A **fixed-stride** layout needs no
    one-hot/iota work at all: the P slots of a packed row belong to the
    same output row, so the reduction is (sum over pass blocks, then a
    static lane-group fold) — pure VPU adds, exact f32.

Layout: rows sorted by degree descending (windows become degree-
homogeneous — the reference's row-skew analysis motif,
row_analysis/row_analysis.py), cut into windows of R rows. Window w takes
``passes_w = ceil(max_deg_in_window / P)`` pass-blocks. Pass-block p of
window w is an (R, k_pad)-shaped slab of stride-summed "products" whose
row r holds ``sum_j vals*x[cols]`` over that row's edges ``p*P + j``
(the P-stream sum happens inside the XLA gather fusion). The Pallas
kernel accumulates a window's pass-blocks with the VMEM-revisit pattern
(out block index = win[block], nondecreasing):

    out[win[b]] (+)= products[block b]          # (R, k_pad), VPU adds

replacing flexspmm's per-warp FMA loops + atomicAdd split-row flags
(flexspmm.cu:96-183, tile.cu:79-91) with race-free sequential-grid
accumulation. Degree sorting replaces the reference's per-SM nnz bucketing
(tile.cu:124-168): load balance comes from homogeneous windows, not work
stealing.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.graph.csr import CSRGraph

DEFAULT_R = 128      # rows per output window
DEFAULT_K_PAD = 32   # feature lanes per slot; P = 128 // k_pad slots/row


# cap on gather-product slots processed at once: bounds the intermediate
# products buffer to ~1 GB (slots * 512 B) however large the graph is
DEFAULT_CHUNK_SLOTS = 8_000_000


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cols", "vals", "win", "t_cols", "t_vals", "t_win",
                 "virt_map", "t_virt_map"],
    meta_fields=["n_rows", "n_cols", "nnz", "r", "k_pad", "symmetric",
                 "chunks", "t_chunks", "products_bf16", "spans",
                 "t_spans", "table_bf16", "span_pass_limit", "n_virt",
                 "n_hub", "t_n_virt", "t_n_hub"],
)
@dataclasses.dataclass(frozen=True)
class EllAdj:
    """Packed fixed-stride ELL adjacency (see module docstring).

    ``cols``/``vals`` are (num_blocks, P, R): stream j (= ``cols[:, j, :]``
    flattened) feeds the j-th stride gather. ``win`` is (num_blocks,)
    int32, the output window of each pass-block — nondecreasing, every
    window of ``ceil(n_rows/R)`` visited at least once. ``t_*`` mirror the
    arrays for A^T (backward dX); aliased when symmetric.

    ``chunks``/``t_chunks``: static tuples of (block_start, block_end,
    win_start, win_end) splitting the block sequence at window boundaries
    so the kernel can bound its gather-products working set; a single
    chunk for small graphs.
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    win: jnp.ndarray
    t_cols: jnp.ndarray
    t_vals: jnp.ndarray
    t_win: jnp.ndarray
    n_rows: int
    n_cols: int
    nnz: int
    r: int
    k_pad: int
    symmetric: bool
    chunks: tuple
    t_chunks: tuple
    # store per-slot gather products as bf16 (halves the padded products
    # write+read traffic; pass-accumulation stays exact f32 in the kernel).
    # One bf16 rounding per slot-sum: opt-in for training runs that accept
    # ~1e-3 relative error on the aggregation.
    products_bf16: bool = False
    # equal-pass-count window spans: static tuples of
    # (block_start, block_end, passes, win_start, win_end). Degree-sorted
    # rows make window pass counts nonincreasing, so equal counts form a
    # handful of contiguous spans (~44 on arxiv) — within a span the
    # pass reduction is a static reshape+sum that XLA fuses with the
    # gather, eliminating the products round-trip entirely (measured
    # 7.9 -> 6.6 ms on arxiv-k32; see ops/ell_spmm.py).
    spans: tuple = ()
    t_spans: tuple = ()
    # round the gather table (features) to bf16 before gathering: halves
    # per-row gather traffic and doubles the residency-fast table height
    # (no cliff through n=233k where f32 degrades 3x — measured,
    # examples/bench_gather.py). Multiply/accumulate stay f32; error is
    # one bf16 rounding of x (~1e-3 relative). Opt-in.
    table_bf16: bool = False
    # spans with pass count above this use the merged Pallas hub region;
    # at or below, the fused grouped-XLA reduce. UNLIMITED (the serving
    # configuration, ell_adjacency(span_pass_limit=0)) is the fastest
    # SpMM — 6.6 ms / ~86-88% of the in-situ gather roofline on
    # arxiv-k32 (the driver bench headline; bench.py measures the
    # roofline in the same session, so the pct is immune to relay
    # day-variance). The 16 default + ``hub_split`` (the round-3
    # default, below) measures within ~2% of serving on the SpMM and
    # EQUAL on a full train step (round 5, TPU: 25.2 ms training
    # default vs 25.9 serving-config at h=32; 12.9 vs 11.9 at h=128).
    # Compile: a vjp+scan training step costs ~40-60 s cold in EITHER
    # config as of round 5 — the round-2 ">400 s serving compile"
    # predates the chunk/span evolution and no longer reproduces; the
    # hub-split default is kept for its bounded per-window pass counts
    # (the lockstep sharded layout and the lower compile-memory
    # envelope), not because serving-config training is impractical.
    # Override the default via GCN_TPU_SPAN_LIMIT. With hub_split no
    # window exceeds the limit in the first place, so this knob only
    # sets the split threshold. (A round-2 session once recorded
    # 6.46 ms under an earlier roofline protocol; the current protocol
    # and numbers are the bench.py capture — kept here so the figures
    # can't drift.)
    span_pass_limit: int = 16
    # hub-row splitting (round 3): rows with more than
    # span_pass_limit * P slots are refined IN PLACE into near-equal
    # virtual chunks, so every window's pass count stays at or below the
    # limit and the whole matrix takes the fused grouped-XLA reduce — no
    # merged Pallas hub region, no extra compile segments from giant
    # spans. A prefix epilogue (segment-sum over ``virt_map``) folds the
    # virtual chunk outputs back into real rows. Measured on arxiv-k32:
    # 6.84 ms vs 6.70 serving / 7.31 hub-region default, with BETTER
    # fill than no-split (0.110 vs 0.123 — balanced chunks shrink
    # within-window degree variance). n_virt/n_hub are the virtual row
    # space height and split-row count (fwd); t_* mirror the transpose.
    # Empty virt_map (n_hub == 0) means no splitting.
    virt_map: jnp.ndarray = None
    t_virt_map: jnp.ndarray = None
    n_virt: int = 0
    n_hub: int = 0
    t_n_virt: int = 0
    t_n_hub: int = 0

    @property
    def p(self) -> int:
        return 128 // self.k_pad

    @property
    def num_blocks(self) -> int:
        return self.cols.shape[0]

    @property
    def row_space(self) -> int:
        """Height of the forward reduce's row space (virtual rows when
        hub splitting is active, else real rows)."""
        return self.n_virt or self.n_rows

    @property
    def t_row_space(self) -> int:
        return self.t_n_virt or self.n_cols

    @property
    def num_windows(self) -> int:
        return -(-self.row_space // self.r)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def pad_fraction(self) -> float:
        total = self.cols.size
        return 1.0 - self.nnz / total if total else 0.0

    def validate(self) -> None:
        """Format-invariant walker — the debugging analogue of the
        reference's UnitHeap::safety_check / csr2seg asserts
        (unitheap.cu:244-295, tile.cu:27-28). Raises AssertionError on
        the first violated invariant. Host-side; not for the hot path."""
        for name, cols, vals, win, n_cols, spans in (
                ("fwd", self.cols, self.vals, self.win, self.n_cols,
                 self.spans),
                ("bwd", self.t_cols, self.t_vals, self.t_win, self.n_rows,
                 self.t_spans)):
            cols_h = np.asarray(cols)
            vals_h = np.asarray(vals)
            win_h = np.asarray(win)
            assert cols_h.shape == vals_h.shape == (win_h.shape[0],
                                                    self.p, self.r), name
            assert (np.diff(win_h) >= 0).all(), \
                f"{name}: win must be nondecreasing"
            nw = int(win_h.max()) + 1 if win_h.size else 0
            assert set(win_h.tolist()) == set(range(nw)), \
                f"{name}: every window must be visited"
            real = vals_h != 0
            assert (cols_h[real] >= 0).all() and \
                (cols_h[real] < n_cols).all(), \
                f"{name}: stored column out of range"
            # <= rather than ==: a source CSR may legitimately store
            # explicit zero-valued entries, which are indistinguishable
            # from padding in this layout (see _ell_sddmm's caveat)
            assert int(real.sum()) <= self.nnz, \
                f"{name}: more stored entries ({int(real.sum())}) than " \
                f"nnz ({self.nnz})"
            for b0, b1, pw, ws, we in spans:
                assert b1 - b0 == (we - ws) * pw, f"{name}: bad span"
                assert (win_h[b0:b1] == np.repeat(
                    np.arange(ws, we), pw)).all(), \
                    f"{name}: span/window mismatch"
        for name, vm, n_hub, n_virt, n_real in (
                ("fwd", self.virt_map, self.n_hub, self.n_virt,
                 self.n_rows),
                ("bwd", self.t_virt_map, self.t_n_hub, self.t_n_virt,
                 self.n_cols)):
            if n_hub == 0:
                assert vm is None or np.asarray(vm).size == 0, name
                continue
            vm_h = np.asarray(vm)
            assert (np.diff(vm_h) >= 0).all(), \
                f"{name}: virt_map must be nondecreasing"
            assert set(vm_h.tolist()) == set(range(n_hub)), \
                f"{name}: virt_map must cover every hub row"
            assert n_virt == len(vm_h) + (n_real - n_hub), \
                f"{name}: virtual row count mismatch"


def degree_sort_order(g: CSRGraph) -> np.ndarray:
    """perm[new] = old, rows by degree descending (stable: preserves the
    incoming — e.g. Rabbit community — order among equal degrees)."""
    deg = np.diff(g.indptr)
    return np.argsort(-deg, kind="stable").astype(np.int32)


def _split_hub_rows(indptr: np.ndarray, cap: int):
    """Refine CSR row boundaries IN PLACE so no row exceeds ``cap`` nnz.

    Each hub row (deg > cap) becomes ceil(deg/cap) near-equal virtual
    chunks (balanced splitting: chunk degrees within +-1, which keeps
    degree-sorted windows homogeneous — the capped [cap,..,rem] variant
    measured +2.4pp pad fraction). Only applied when the hub rows form a
    PREFIX (true after degree_sort_order); otherwise returns None and the
    caller falls back to the merged-Pallas hub region.

    Returns (virt_indptr, virt_map, n_hub, n_virt) where virt_map[vr] is
    the real row of virtual row vr (vr < n_virt_hub = len(virt_map),
    nondecreasing); virtual rows beyond that are real rows n_hub.. shifted
    by len(virt_map) - n_hub. This is the TPU answer to flexspmm's
    split-row atomicAdd flag (tile.cu:79-91): rows are split at the TILER
    and re-reduced by a static prefix segment-sum epilogue instead of
    device atomics.
    """
    deg = np.diff(indptr).astype(np.int64)
    hub = deg > cap
    n_hub = int(hub.sum())
    if n_hub == 0 or hub[n_hub:].any() or not hub[:n_hub].all():
        return None
    n = len(deg)
    m = -(-deg[:n_hub] // cap)                   # chunks per hub row
    n_virt_hub = int(m.sum())
    virt_map = np.repeat(np.arange(n_hub, dtype=np.int32),
                         m).astype(np.int32)
    # balanced boundaries: chunk c of row r ends at base + round(d*(c+1)/m)
    ends = np.zeros(n_virt_hub, dtype=np.int64)
    pos = 0
    for r in range(n_hub):
        d, mr = int(deg[r]), int(m[r])
        q, rem = divmod(d, mr)
        sizes = np.full(mr, q, dtype=np.int64)
        sizes[:rem] += 1
        ends[pos:pos + mr] = indptr[r] + np.cumsum(sizes)
        pos += mr
    virt_indptr = np.concatenate([
        np.zeros(1, dtype=np.int64), ends,
        indptr[n_hub + 1:].astype(np.int64)])
    return virt_indptr, virt_map, n_hub, n_virt_hub + (n - n_hub)


def _window_passes(indptr: np.ndarray, n: int, r: int, p: int) -> np.ndarray:
    """Per-window pass counts (>=1: every window is always written)."""
    deg = np.diff(indptr).astype(np.int64)
    num_windows = max(1, -(-n // r))
    deg_pad = np.zeros(num_windows * r, dtype=np.int64)
    deg_pad[:n] = deg
    wmax = deg_pad.reshape(num_windows, r).max(axis=1)
    return np.maximum(1, -(-wmax // p))


def _ell_arrays(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                n: int, r: int, p: int, max_pass_values: int = 0,
                forced_passes: Optional[np.ndarray] = None):
    deg = np.diff(indptr).astype(np.int64)
    num_windows = max(1, -(-n // r))
    passes = _window_passes(indptr, n, r, p)
    if forced_passes is not None:
        # lockstep layout (sharded stacking): every shard lays out the
        # SAME per-window pass counts so block indices, win, and spans
        # are shard-uniform and stack without padding
        assert len(forced_passes) == num_windows
        assert (forced_passes >= passes).all(), \
            "forced passes must cover every shard's real degrees"
        passes = np.asarray(forced_passes, dtype=np.int64)
    elif max_pass_values:
        passes = _quantize_passes(passes, max_pass_values)
    pass_off = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(passes, out=pass_off[1:])
    num_blocks = int(pass_off[-1])

    e = len(indices)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    j = np.arange(e, dtype=np.int64) - np.repeat(indptr[:-1].astype(np.int64),
                                                 deg)
    w = rows // r
    blk = pass_off[w] + j // p
    cols = np.zeros((num_blocks, p, r), dtype=np.int32)
    vals = np.zeros((num_blocks, p, r), dtype=np.float32)
    cols[blk, j % p, rows - w * r] = indices
    vals[blk, j % p, rows - w * r] = data
    win = np.repeat(np.arange(num_windows, dtype=np.int32), passes)
    return cols, vals, win, pass_off


def _span_plan(pass_off: np.ndarray) -> tuple:
    """Contiguous window spans with equal pass count:
    (block_start, block_end, passes, win_start, win_end) per span."""
    passes = np.diff(pass_off)
    nw = len(passes)
    spans = []
    ws = 0
    while ws < nw:
        we = ws
        while we < nw and passes[we] == passes[ws]:
            we += 1
        spans.append((int(pass_off[ws]), int(pass_off[we]),
                      int(passes[ws]), ws, we))
        ws = we
    return tuple(spans)


# The kernel emits one HLO gather+reduce segment per grouped span (plus
# one per contiguous hub run). On a DEGREE-SORTED graph pass counts are
# nonincreasing, so spans == distinct pass values (~44 on arxiv at
# k_pad=32 — the intended program size, and what the span_pass_limit
# knob budgets for). Without the sort, equal pass counts fragment into
# MANY runs (65+ on pubmed measured; unbounded in general), blowing
# compile time and risking the compile relay's program-size limit —
# those adjacencies fall back to the single Pallas revisit reduce
# (round-1 path) instead. Degree-sorted graphs whose DISTINCT pass
# values exceed the budget (small P — e.g. k_pad=128 makes P=1, so pass
# counts are raw window max degrees) are instead QUANTIZED to an
# optimal <=48-value pass ladder (_quantize_passes) so they keep the
# grouped reduce.
_MAX_REDUCE_SEGMENTS = 48


def _quantize_passes(passes: np.ndarray, max_values: int) -> np.ndarray:
    """Round per-window pass counts UP to an optimal ladder of at most
    ``max_values`` distinct values (minimizing total padded slots).

    Rationale: the grouped-XLA reduce emits one HLO segment per distinct
    pass value, so distinct values are compile time / program size. At
    k_pad=32 (P=4) degree-sorted graphs land at ~44 naturally, but at
    k_pad=128 (P=1, the wide-feature single-gather-pass configuration)
    pass counts are raw window max degrees — ~95 distinct on arxiv.
    Choosing which values to keep is a 1-D partition DP: group the
    ascending distinct values into <= max_values contiguous groups, each
    group padding to its max; cost of a group is max_value * windows_in
    _group. Exact DP, host-side, O(V^2 * S) with V ~ 100.

    Monotone-safe: rounding up preserves the nonincreasing pass order a
    degree sort produces, so spans stay contiguous. Measured on arxiv
    P=1: unquantized 95 values / pad 0.031 -> 48 values / pad 0.043
    (vs 0.123 at P=4). TPU effect (v5e serving, arxiv): the ladder keeps
    k=128 x k_pad=128 on the grouped reduce at 6.35 ms (366.7M edges/s)
    where the pre-ladder span guard dropped it to the Pallas-fallback
    path, and k_pad=32 column-chunking takes 51.8 ms — 8.2x. At k=32 the
    slot saving does NOT pay (8.59 ms vs 6.54 at k_pad=32: per-slot cost
    rises with 128-lane slots), so DEFAULT_K_PAD stays 32 and the models
    pick k_pad by their widest SpMM operand (models/gcn.py)."""
    v, c = np.unique(passes, return_counts=True)  # ascending
    V = len(v)
    if V <= max_values:
        return passes
    C = np.concatenate([[0], np.cumsum(c)])
    INF = np.inf
    S = max_values
    # f[j, s] = min slot-cost of covering distinct values 1..j (1-based)
    # with s groups, the last group ending (and padding) at v[j-1]
    f = np.full((V + 1, S + 1), INF)
    f[0, 0] = 0.0
    arg = np.zeros((V + 1, S + 1), dtype=np.int64)
    for j in range(1, V + 1):
        fs = f[:j]  # rows i = group start candidates
        cost_tail = v[j - 1] * (C[j] - C[:j])  # windows i..j-1 pad to v[j-1]
        for s in range(1, S + 1):
            tot = fs[:, s - 1] + cost_tail
            i = int(np.argmin(tot))
            f[j, s] = tot[i]
            arg[j, s] = i
    s = int(np.argmin(f[V]))
    j = V
    mapped = np.empty(V, dtype=passes.dtype)
    while j > 0:
        i = arg[j, s]
        mapped[i:j] = v[j - 1]
        j, s = i, s - 1
    lut = dict(zip(v.tolist(), mapped.tolist()))
    return np.vectorize(lut.__getitem__)(passes).astype(passes.dtype)


def _guard_spans(spans: tuple, span_pass_limit: int) -> tuple:
    # Segment count is what actually bounds compile time / program size,
    # regardless of whether the excess came from run fragmentation
    # (unsorted graphs) or from a degree-sorted graph with very many
    # distinct pass values under an unlimited serving config — both fall
    # back to the Pallas reduce past the budget.
    segments = 0
    prev_hub = False
    for _, _, pw, _, _ in spans:
        hub = pw > span_pass_limit
        if not hub or not prev_hub:
            segments += 1
        prev_hub = hub
    return () if segments > _MAX_REDUCE_SEGMENTS else spans


def _chunk_plan(pass_off: np.ndarray, p: int, r: int,
                max_slots: int) -> tuple:
    """Split blocks into chunks of <= max_slots slots at window starts."""
    num_windows = len(pass_off) - 1
    max_blocks = max(1, max_slots // (p * r))
    chunks = []
    ws = 0
    while ws < num_windows:
        # furthest window end keeping the block count within budget
        we = int(np.searchsorted(pass_off, pass_off[ws] + max_blocks,
                                 side="right")) - 1
        we = max(we, ws + 1)
        chunks.append((int(pass_off[ws]), int(pass_off[we]), ws, int(we)))
        ws = we
    return tuple(chunks)


def _pass_runs(passes: np.ndarray) -> int:
    """Number of contiguous equal-value runs (= reduce segments when no
    value exceeds the span limit)."""
    if len(passes) == 0:
        return 0
    return int(1 + np.count_nonzero(np.diff(passes)))


def _ladder_passes(indptr, n, r, p):
    """The <=48-value pass ladder when it would keep the grouped reduce,
    else None.

    Degree-SORTED graphs have nonincreasing passes, so the ladder's
    <=48 distinct values are exactly <=48 contiguous runs. Hub-SPLIT
    graphs oscillate locally (balanced chunk degrees land anywhere in
    [cap/2, cap], so the virtual-row prefix is only approximately
    sorted — at P=1 this pushed distinct window maxima past the budget
    with no monotone rescue, silently dropping the k_pad>=64 TRAINING
    default to the Pallas fallback, round-5 finding). Quantization
    itself never needs monotonicity — it maps values up via a
    value-partition DP — and it MERGES adjacent near-equal windows, so
    the right test is simply whether the quantized run count fits the
    segment budget. Unsorted graphs still fail that test and keep the
    fallback (padding them would be a pure loss).
    """
    passes = _window_passes(indptr, n, r, p)
    if (len(np.unique(passes)) <= _MAX_REDUCE_SEGMENTS
            and _pass_runs(passes) <= _MAX_REDUCE_SEGMENTS):
        return None                    # native layout's spans survive
    # nonincreasing envelope (reverse cummax): identity on a degree-
    # sorted tail, pads local dips up to later peaks in the hub-split
    # prefix (~2% extra slots on arxiv at P=1); a genuinely unsorted
    # graph would inflate toward global-max-everywhere — gated at +15%
    mono = np.maximum.accumulate(passes[::-1])[::-1]
    if mono.sum() > 1.15 * passes.sum():
        return None
    if len(np.unique(mono)) > _MAX_REDUCE_SEGMENTS:
        mono = _quantize_passes(mono, _MAX_REDUCE_SEGMENTS)
    return mono


def _tile(indptr, indices, data, n, r, p, prefer_native):
    # small P (e.g. k_pad=128 -> P=1) can push distinct pass values past
    # the reduce-segment budget; the numpy layout applies the optimal
    # pass ladder then (the native tiler lays out unquantized passes)
    ladder = _ladder_passes(indptr, n, r, p)
    if ladder is not None:
        return _ell_arrays(indptr, indices, data, n, r, p,
                           forced_passes=ladder)
    if prefer_native:
        from gcn_tpu.tile import native

        if native.available():
            cols, vals, win = native.ell_arrays(indptr, indices, data, n,
                                                r, p)
            nw = max(1, -(-n // r))
            off = np.searchsorted(win, np.arange(nw + 1)).astype(np.int64)
            return cols, vals, win, off
    return _ell_arrays(indptr, indices, data, n, r, p)


def ell_adjacency(
    g: CSRGraph,
    *,
    r: int = DEFAULT_R,
    k_pad: int = DEFAULT_K_PAD,
    symmetric: Optional[bool] = None,
    prefer_native: bool = True,
    chunk_slots: int = DEFAULT_CHUNK_SLOTS,
    products_bf16: bool = False,
    table_bf16: bool = False,
    span_pass_limit: Optional[int] = None,
    hub_split: Optional[bool] = None,
) -> EllAdj:
    """Tile a CSR graph into the EllAdj device format for feature widths
    <= ``k_pad`` (wider x is processed in k_pad-column chunks).

    Best fill when rows are sorted by degree descending (compose
    ``degree_sort_order`` into the reorder pipeline first); correct for any
    row order.

    ``hub_split`` (default on, env GCN_TPU_HUB_SPLIT=0 to disable):
    split hub rows into <= span_pass_limit-pass virtual chunks so the
    whole matrix takes the fused grouped reduce (see _split_hub_rows /
    the EllAdj field docs). Ignored when span_pass_limit is unlimited
    (serving) or the hub rows are not a degree-sorted prefix.
    """
    assert r % 8 == 0, "row window must be sublane-aligned"
    assert k_pad in (8, 16, 32, 64, 128), "k_pad must divide 128"
    if span_pass_limit is None:
        env = os.environ.get("GCN_TPU_SPAN_LIMIT")
        # default budgets a constant 64 SLOTS/row whatever the packing:
        # 16 passes at k_pad=32 (P=4, the measured compile/perf point),
        # 64 passes at k_pad=128 (P=1). Env override is absolute passes.
        span_pass_limit = (int(env) if env is not None
                           else max(1, k_pad // 2))
    if chunk_slots == DEFAULT_CHUNK_SLOTS and k_pad > DEFAULT_K_PAD:
        # keep the products-buffer BYTE bound constant: slots are
        # k_pad lanes wide, so wide-slot formats chunk at fewer slots
        chunk_slots = chunk_slots * DEFAULT_K_PAD // k_pad
    if span_pass_limit <= 0:          # 0 / negative = unlimited (serving)
        span_pass_limit = 1 << 30
    if hub_split is None:
        hub_split = os.environ.get("GCN_TPU_HUB_SPLIT", "1") != "0"
    hub_split = hub_split and span_pass_limit < (1 << 30)
    p = 128 // k_pad
    if symmetric is None:
        symmetric = g.shape[0] == g.shape[1] and g.is_symmetric()
    n, m = g.shape
    cap = span_pass_limit * p
    if g.nnz and (np.asarray(g.data) == 0).any():
        # explicit zero-valued nnz are indistinguishable from padding in
        # this layout: forward/dx are unaffected (0-weight edges contribute
        # nothing) but the SDDMM edge-weight cotangent is silently zero at
        # those slots — anyone training adjacency values through zero must
        # use the coo representation (ops/spmm.py). See _ell_sddmm.
        import warnings

        warnings.warn(
            "source CSR stores explicit zero-valued entries; their "
            "edge-weight gradients through spmm_ell are zero (use the coo "
            "path to train adjacency weights through 0.0)")
    split = _split_hub_rows(g.indptr, cap) if hub_split else None
    if split is not None:
        indptr_f, virt_map, n_hub, n_virt = split
        virt_map_j = jnp.asarray(virt_map)
    else:
        indptr_f, virt_map_j, n_hub, n_virt = g.indptr, None, 0, 0
    cols, vals, win, off = _tile(indptr_f, g.indices, g.data,
                                 max(n_virt, n) if split is not None else n,
                                 r, p, prefer_native)
    chunks = _chunk_plan(off, p, r, chunk_slots)
    spans = _guard_spans(_span_plan(off), span_pass_limit)
    cols_j, vals_j, win_j = jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(win)
    if symmetric:
        t = (cols_j, vals_j, win_j)
        t_chunks = chunks
        t_spans = spans
        t_virt_map_j, t_n_hub, t_n_virt = virt_map_j, n_hub, n_virt
    else:
        gt = g.transpose()
        t_split = _split_hub_rows(gt.indptr, cap) if hub_split else None
        if t_split is not None:
            t_indptr, t_vmap, t_n_hub, t_n_virt = t_split
            t_virt_map_j = jnp.asarray(t_vmap)
        else:
            t_indptr, t_virt_map_j, t_n_hub, t_n_virt = (gt.indptr, None,
                                                         0, 0)
        tc, tv, tw, toff = _tile(
            t_indptr, gt.indices, gt.data,
            max(t_n_virt, m) if t_split is not None else m, r, p,
            prefer_native)
        t = (jnp.asarray(tc), jnp.asarray(tv), jnp.asarray(tw))
        t_chunks = _chunk_plan(toff, p, r, chunk_slots)
        t_spans = _guard_spans(_span_plan(toff), span_pass_limit)
    return EllAdj(
        cols=cols_j, vals=vals_j, win=win_j,
        t_cols=t[0], t_vals=t[1], t_win=t[2],
        n_rows=n, n_cols=m, nnz=g.nnz, r=r, k_pad=k_pad,
        symmetric=bool(symmetric), chunks=chunks, t_chunks=t_chunks,
        products_bf16=products_bf16, spans=spans, t_spans=t_spans,
        table_bf16=table_bf16, span_pass_limit=span_pass_limit,
        virt_map=virt_map_j, t_virt_map=t_virt_map_j,
        n_virt=n_virt, n_hub=n_hub, t_n_virt=t_n_virt, t_n_hub=t_n_hub,
    )
