"""Halo exchange: send only the boundary activations a shard actually needs.

The baseline distributed SpMM all-gathers every band (n*k floats per layer
per device, gcn_tpu.parallel.spmm_dist). After a locality reorder most
edges are intra-band, so each shard references only a small boundary set of
off-shard rows. This module builds a static exchange plan from the graph
structure and swaps the all_gather for one ``all_to_all`` whose payload is
just those boundary rows — the context-parallel-style edge partition the
survey calls for (SURVEY.md §5 "long-context" row, §7 step 8).

Plan arrays (leading axis = device, shard_map-ready):

  send_idx  int32[src, dst, H]   local row ids src must ship to dst;
                                 the self slice (src == dst) is zeros —
                                 local columns never leave the chip, the
                                 kernel reads them straight from the band
  col_remap int32[dst, e_max]    per edge: flat index into
                                 concat(halo, own band): off-shard edges
                                 map to src*H + position, on-shard edges
                                 to n_shards*H + local_row

H is the max boundary size over off-shard (dst, src) pairs, so per-device
exchange bytes are n_shards*H*k*4 versus n*k*4 for the all-gather;
``HaloPlan.exchange_fraction`` reports the ratio. Differentiating through
the step works out of the box: the transpose of all_to_all is all_to_all
and the transpose of the send-gather is a scatter-add back onto the band.

Ragged plan (the default, ``build_halo_plan_ragged``): the all_to_all pads
every pair to the GLOBAL max boundary, which on 8-shard arxiv inflates the
exchange to 0.39 (rabbit) – 0.97 (gorder3) of the full row count. The
ragged plan decomposes the exchange into ns-1 ``ppermute`` ring shifts —
at offset t every device s ships its boundary for device (s+t)%ns — so
each offset carries its own static payload H_t = max over the pairs AT
THAT OFFSET only. Measured on 8-shard synth-arxiv (rabbit + band degree
sort): exchanged rows/device drop 66,176 -> 53,880 (0.318 of full rows),
within 1.06x of the true mean unique-boundary volume (50,960). For
dst-skewed orderings (gorder3: one band needs ~20k rows from every peer)
the per-offset sum is within 0.5% of the row-sum lower bound that ANY
static-shape permutation decomposition must pay — i.e. this is as ragged
as TPU collectives get without dynamic shapes. Empty offsets compile to
nothing; the collectives are mutually independent so XLA may overlap
them, and ppermute transposes to ppermute under AD.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.parallel.partition import ShardedGraph


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "col_remap"],
    meta_fields=["h_max", "n_shards", "n_rows"],
)
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    send_idx: np.ndarray    # int32[n_shards, n_shards, h_max], HOST
    col_remap: np.ndarray   # int32[n_shards, e_max], HOST
    h_max: int
    n_shards: int
    n_rows: int

    @property
    def exchange_fraction(self) -> float:
        """Per-device exchanged rows vs the all-gather's full row count."""
        return self.n_shards * self.h_max / max(self.n_rows, 1)

    @property
    def halo_rows(self) -> int:
        """Height of the received-halo region of the gather table."""
        return self.n_shards * self.h_max

    @property
    def device_arrays(self) -> tuple:
        """Per-device jit arguments in exchange order (col_remap last)."""
        return (self.send_idx, self.col_remap)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "col_remap"],
    meta_fields=["sizes", "n_shards", "n_rows"],
)
@dataclasses.dataclass(frozen=True)
class RaggedHaloPlan:
    """Per-ring-offset exchange plan (see module docstring).

    send_idx  int32[src, sum(sizes)]  per SOURCE device: concatenation
              over nonzero offsets t of the local rows it ships to device
              (src+t)%ns, each segment padded to sizes[t-1]
    col_remap int32[dst, e_max]       per edge: flat index into
              concat(zeros(8), halo segments in offset order, own band);
              the leading 8-row zero segment is where padding edges
              (val 0) point, so they always gather zeros
    sizes     static per-offset payload heights (t = 1..ns-1), each the
              max boundary over the pairs at that offset, rounded to 8;
              0 = no pair at the offset needs anything (no collective)
    """

    send_idx: np.ndarray    # host numpy until device placement
    col_remap: np.ndarray
    sizes: tuple
    n_shards: int
    n_rows: int

    @property
    def halo_rows(self) -> int:
        return 8 + sum(self.sizes)

    @property
    def exchange_fraction(self) -> float:
        """Per-device exchanged rows vs the all-gather's full row count."""
        return sum(self.sizes) / max(self.n_rows, 1)

    @property
    def device_arrays(self) -> tuple:
        return (self.send_idx, self.col_remap)


def _shard_edge_groups(cols_d, vals_d, rps, ns):
    """Group one shard's edge slots by SOURCE shard in a single sort.

    Returns ``(order, seg, lid_sorted)``: ``order`` permutes slots so
    sources ascend (padding slots — val 0 — sort to a trailing sentinel
    group and never enter any segment), ``seg[s]:seg[s+1]`` slices the
    slots whose column lives on shard s, ``lid_sorted`` their local ids.
    Every planner below runs off these segments, so plan construction is
    O(E log E) total — independent of the shard count, where the naive
    per-pair masking re-scans each shard's slots ns times (O(ns*E), which
    a 64-256-chip pod slice cannot afford)."""
    src = cols_d // rps
    src = np.where(vals_d != 0, src, ns)   # padding -> sentinel group
    order = np.argsort(src, kind="stable")
    seg = np.searchsorted(src[order], np.arange(ns + 1))
    return order, seg, (cols_d % rps)[order]


def _pair_boundaries(sg: ShardedGraph):
    """``(needed, groups)``: needed[d, s] = sorted unique local ids on
    shard s that shard d's edges reference (s != d); groups[d] the
    ``_shard_edge_groups`` tuple for shard d, returned so the builders'
    col_remap loops reuse the one source-sort instead of re-sorting."""
    ns, rps = sg.n_shards, sg.rows_per_shard
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)
    needed = {}
    groups = []
    for d in range(ns):
        grp = _shard_edge_groups(cols[d], vals[d], rps, ns)
        groups.append(grp)
        _, seg, lid_sorted = grp
        for s in range(ns):
            if s != d:
                needed[d, s] = np.unique(lid_sorted[seg[s]:seg[s + 1]])
    return needed, groups


def build_halo_plan_ragged(sg: ShardedGraph) -> RaggedHaloPlan:
    """Per-offset boundary-exchange plan from a row-banded graph."""
    ns, rps = sg.n_shards, sg.rows_per_shard
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)
    e_max = cols.shape[1]
    needed, groups = _pair_boundaries(sg)

    sizes = []
    for t in range(1, ns):
        h = max((len(needed[(s + t) % ns, s]) for s in range(ns)),
                default=0)
        sizes.append(_round_up(h, 8) if h else 0)
    sizes = tuple(sizes)
    # receive-segment base offset per t (0-keyed entries never looked up)
    base = {}
    off = 8  # leading zero segment (padding-edge target)
    for t in range(1, ns):
        base[t] = off
        off += sizes[t - 1]

    send_idx = np.zeros((ns, sum(sizes)), dtype=np.int32)
    col_remap = np.zeros((ns, e_max), dtype=np.int32)
    for s in range(ns):
        o = 0
        for t in range(1, ns):
            if sizes[t - 1] == 0:
                continue
            u = needed[(s + t) % ns, s]
            send_idx[s, o:o + len(u)] = u
            o += sizes[t - 1]
    for d in range(ns):
        order, seg, lid_sorted = groups[d]
        for s in range(ns):
            slots = order[seg[s]:seg[s + 1]]
            lids = lid_sorted[seg[s]:seg[s + 1]]
            if s == d:
                col_remap[d, slots] = off + lids
                continue
            u = needed[d, s]
            pos = np.searchsorted(u, lids)
            if len(lids):
                assert np.array_equal(u[pos], lids), \
                    "halo plan missed a referenced boundary row"
            col_remap[d, slots] = base[(d - s) % ns] + pos
            # padding edges keep col_remap 0 -> the zero segment
    # HOST numpy, like every planner output (CLAUDE.md): the arrays only
    # go to the device as jit/device_put arguments (device_arrays), never
    # eagerly at plan-build time — a 256-shard col_remap is ~100 MB.
    return RaggedHaloPlan(
        send_idx=send_idx, col_remap=col_remap,
        sizes=sizes, n_shards=ns, n_rows=sg.n_rows,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_intra", "send_inter", "send_fan", "col_remap"],
    meta_fields=["intra_sizes", "inter_sizes", "fan_sizes", "n_hosts",
                 "n_chips", "n_rows"],
)
@dataclasses.dataclass(frozen=True)
class HierHaloPlan:
    """Two-level (host x chip) boundary-exchange plan.

    On a pod, a flat exchange ships every (dst, src) boundary over
    whatever link connects the pair — mostly DCN once shards span hosts.
    The hierarchical plan moves same-host boundaries over the chip axis
    (ICI, ragged per-offset ppermutes as in RaggedHaloPlan) and, across
    hosts, ships each source's boundary ONCE per destination HOST — the
    union over that host's chips (DCN) — then fans it out intra-host
    over ICI. DCN rows per device drop from sum-over-remote-devices to
    sum-over-remote-hosts-of-unions (dedup factor up to n_chips);
    the fan-out rides ICI where bandwidth is an order of magnitude
    cheaper (BASELINE.md 1 chip / 1 host / N hosts reporting points).

    Fan-out flavors (round 4): the original all_gather fan-out ships
    EVERY received union to every same-host chip — (n_chips-1) *
    sum(inter_sizes) ICI rows/device, ~3x what chips actually read at
    pod-slice scale. The ragged fan-out (``fanout="ragged"``, default)
    forwards, per (host offset, chip offset), only the SUBSET of the
    held union that the destination chip's edges reference — the chip
    holding union[hd, s] (the one sharing s's chip index) gathers
    needed[dst, s] out of it and ppermutes it tc chips over; the
    tc == 0 destination reads the union buffer directly.

    send_intra int32[ns, sum(intra_sizes)]  chip-offset segments (band
               row ids)
    send_inter int32[ns, sum(inter_sizes)]  host-offset UNION segments
               (band row ids)
    send_fan   int32[ns, sum(fan_sizes)]    ragged fan-out: indices into
               the RECEIVED union buffer (not the band); zeros(0, ...)
               in all_gather mode
    col_remap  int32[ns, e_max]  into concat(zeros(8), intra segments,
               received unions, fan-out segments | all-gathered unions
               (chip-major), own band)
    fan_sizes  per-(host offset, chip offset) payload heights, flattened
               th-major; None = all_gather fan-out
    """

    send_intra: np.ndarray  # host numpy until device placement
    send_inter: np.ndarray
    send_fan: np.ndarray
    col_remap: np.ndarray
    intra_sizes: tuple
    inter_sizes: tuple
    fan_sizes: Optional[tuple]
    n_hosts: int
    n_chips: int
    n_rows: int

    @property
    def halo_rows(self) -> int:
        if self.fan_sizes is None:
            return 8 + sum(self.intra_sizes) + self.n_chips * sum(
                self.inter_sizes)
        return (8 + sum(self.intra_sizes) + sum(self.inter_sizes)
                + sum(self.fan_sizes))

    @property
    def exchange_fraction(self) -> float:
        """Per-device exchanged rows (ICI intra + DCN inter) vs a full
        all-gather; the ICI fan-out is reported separately."""
        return (sum(self.intra_sizes) + sum(self.inter_sizes)) / max(
            self.n_rows, 1)

    @property
    def dcn_fraction(self) -> float:
        """Per-device DCN rows vs a full all-gather."""
        return sum(self.inter_sizes) / max(self.n_rows, 1)

    @property
    def ici_gather_rows(self) -> int:
        """Rows each device pulls over ICI in the inter-union fan-out."""
        if self.fan_sizes is None:
            return (self.n_chips - 1) * sum(self.inter_sizes)
        return sum(self.fan_sizes)

    @property
    def device_arrays(self) -> tuple:
        return (self.send_intra, self.send_inter, self.send_fan,
                self.col_remap)


def build_halo_plan_hier(sg: ShardedGraph, n_hosts: int,
                         n_chips: int,
                         fanout: str = "ragged") -> HierHaloPlan:
    """Hierarchical exchange plan; shard id = host * n_chips + chip.

    fanout: "ragged" (default) forwards only the per-destination needed
    subsets of each received union over the chip axis; "all_gather"
    keeps the round-3 full-union broadcast (see HierHaloPlan)."""
    assert fanout in ("ragged", "all_gather"), fanout
    ns, rps = sg.n_shards, sg.rows_per_shard
    assert ns == n_hosts * n_chips
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)
    e_max = cols.shape[1]
    needed, groups = _pair_boundaries(sg)

    # intra-host: ragged per-chip-offset sizes (max over hosts AND chips)
    intra_sizes = []
    for t in range(1, n_chips):
        h = max((len(needed[hh * n_chips + (c + t) % n_chips,
                            hh * n_chips + c])
                 for hh in range(n_hosts) for c in range(n_chips)),
                default=0)
        intra_sizes.append(_round_up(h, 8) if h else 0)
    intra_sizes = tuple(intra_sizes)

    # inter-host: union over the destination host's chips, per source
    union = {}
    for s in range(ns):
        hs = s // n_chips
        for hd in range(n_hosts):
            if hd == hs:
                continue
            u = np.unique(np.concatenate(
                [needed[hd * n_chips + c, s] for c in range(n_chips)]))
            union[hd, s] = u
    inter_sizes = []
    for th in range(1, n_hosts):
        h = max((len(union[(s // n_chips + th) % n_hosts, s])
                 for s in range(ns)), default=0)
        inter_sizes.append(_round_up(h, 8) if h else 0)
    inter_sizes = tuple(inter_sizes)

    intra_base = {}
    off = 8
    for t in range(1, n_chips):
        intra_base[t] = off
        off += intra_sizes[t - 1]
    inter_base = off  # received unions start here
    sum_inter = sum(inter_sizes)
    ioff = {}
    o = 0
    for th in range(1, n_hosts):
        ioff[th] = o
        o += inter_sizes[th - 1]

    # ragged fan-out: per (host offset, chip offset), the forwarder
    # (h, c) holds union[h, s] for s = ((h-th)%nh)*nc + c and ships the
    # subset needed[(h, (c+tc)%nc), s] — only rows the destination reads
    fan_sizes = None
    fan_off = {}
    sum_fan = 0
    if fanout == "ragged":
        # needed[dst, src] is a subset of union[host(dst), src] by
        # construction, so the forwarded subset IS the needed set
        fs_list = []
        for th in range(1, n_hosts):
            for tc in range(1, n_chips):
                h = max(
                    len(needed[hh * n_chips + (c + tc) % n_chips,
                               ((hh - th) % n_hosts) * n_chips + c])
                    for hh in range(n_hosts) for c in range(n_chips))
                fs_list.append(_round_up(h, 8) if h else 0)
        fan_sizes = tuple(fs_list)
        sum_fan = sum(fan_sizes)
        fan_base = 8 + sum(intra_sizes) + sum_inter
        o, i = 0, 0
        for th in range(1, n_hosts):
            for tc in range(1, n_chips):
                fan_off[th, tc] = fan_base + o
                o += fan_sizes[i]
                i += 1
        band_off = fan_base + sum_fan
    else:
        band_off = inter_base + n_chips * sum_inter

    send_intra = np.zeros((ns, sum(intra_sizes)), dtype=np.int32)
    send_inter = np.zeros((ns, sum_inter), dtype=np.int32)
    # min width 8: zero-element arrays lose their sharding spec under
    # device_put (XLA canonicalizes them to replicated), breaking
    # shard_map in_specs; the pad is never read (fan offsets stop at
    # sum_fan)
    send_fan = np.zeros((ns, max(sum_fan, 8)), dtype=np.int32)
    for s in range(ns):
        hs, cs = divmod(s, n_chips)
        o = 0
        for t in range(1, n_chips):
            if intra_sizes[t - 1] == 0:
                continue
            u = needed[hs * n_chips + (cs + t) % n_chips, s]
            send_intra[s, o:o + len(u)] = u
            o += intra_sizes[t - 1]
        o = 0
        for th in range(1, n_hosts):
            if inter_sizes[th - 1] == 0:
                continue
            u = union[(hs + th) % n_hosts, s]
            send_inter[s, o:o + len(u)] = u
            o += inter_sizes[th - 1]
        if fanout == "ragged":
            # here (hs, cs) acts as the FORWARDER (h, c): indices into
            # its received union buffer B (th-major segments)
            o, i = 0, 0
            for th in range(1, n_hosts):
                src = ((hs - th) % n_hosts) * n_chips + cs
                u = union[hs, src]
                for tc in range(1, n_chips):
                    if fan_sizes[i] == 0:
                        i += 1
                        continue
                    dst = hs * n_chips + (cs + tc) % n_chips
                    sub = needed[dst, src]
                    pos = ioff[th] + np.searchsorted(u, sub)
                    send_fan[s, o:o + len(sub)] = pos
                    o += fan_sizes[i]
                    i += 1

    col_remap = np.zeros((ns, e_max), dtype=np.int32)
    for d in range(ns):
        hd, cd = divmod(d, n_chips)
        order, seg, lid_sorted = groups[d]
        for s in range(ns):
            slots = order[seg[s]:seg[s + 1]]
            lids = lid_sorted[seg[s]:seg[s + 1]]
            if s == d:
                col_remap[d, slots] = band_off + lids
                continue
            hs, cs = divmod(s, n_chips)
            th = (hd - hs) % n_hosts
            tc = (cd - cs) % n_chips
            if hs == hd:
                u = needed[d, s]
                base = intra_base[tc]
            elif fanout == "ragged" and tc != 0:
                # rows arrive via the ragged fan-out segment holding
                # exactly needed[d, s]
                u = needed[d, s]
                base = fan_off[th, tc]
            elif fanout == "ragged":
                # same chip index: read the received union directly
                u = union[hd, s]
                base = inter_base + ioff[th]
            else:
                u = union[hd, s]
                base = inter_base + cs * sum_inter + ioff[th]
            pos = np.searchsorted(u, lids)
            if len(lids):
                assert np.array_equal(u[pos], lids), \
                    "hier halo plan missed a boundary row"
            col_remap[d, slots] = base + pos
    return HierHaloPlan(
        send_intra=send_intra, send_inter=send_inter, send_fan=send_fan,
        col_remap=col_remap,   # host numpy; see build_halo_plan_ragged
        intra_sizes=intra_sizes, inter_sizes=inter_sizes,
        fan_sizes=fan_sizes,
        n_hosts=n_hosts, n_chips=n_chips, n_rows=sg.n_rows,
    )


def build_halo_plan(sg: ShardedGraph) -> HaloPlan:
    """Static boundary-exchange plan from a row-banded graph."""
    ns, rps = sg.n_shards, sg.rows_per_shard
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)
    e_max = cols.shape[1]

    needed, groups = _pair_boundaries(sg)
    h_max = max(1, max(len(u) for u in needed.values())) if needed else 1
    h_max = _round_up(h_max, 8)

    send_idx = np.zeros((ns, ns, h_max), dtype=np.int32)
    col_remap = np.zeros((ns, e_max), dtype=np.int32)
    for d in range(ns):
        order, seg, lid_sorted = groups[d]
        for s in range(ns):
            slots = order[seg[s]:seg[s + 1]]
            lids = lid_sorted[seg[s]:seg[s + 1]]
            if s == d:
                col_remap[d, slots] = ns * h_max + lids
                continue
            u = needed[d, s]
            send_idx[s, d, :len(u)] = u
            pos = np.searchsorted(u, lids)
            if len(lids):
                assert np.array_equal(u[pos], lids), \
                    "halo plan missed a referenced boundary row"
            col_remap[d, slots] = s * h_max + pos
            # padding slots keep col_remap 0 (their val is 0)
    return HaloPlan(
        send_idx=send_idx, col_remap=col_remap,   # host numpy (see
        # build_halo_plan_ragged); device placement happens downstream
        h_max=h_max, n_shards=ns, n_rows=sg.n_rows,
    )


def _prep_send(x_band, send_idx, pre, wire_dtype):
    """Gather send rows, apply the optional pre transform, cast for the
    wire. Returns (rows, out_dtype): out_dtype is what the halo table
    must be cast back to after the collectives. One definition so every
    exchange flavor shares one cast policy.

    Narrow-range wire dtypes (fp8: float8_e4m3fn tops out at 448 and
    SATURATES TO NaN on overflow — no inf encoding) get a clip to the
    wire's finite range first; bf16 shares f32's exponent range so the
    clip is a no-op there and skipped. The clip is exact for in-range
    values and turns a would-be NaN into the wire's max — the same
    saturate-on-overflow policy hardware fp8 paths use.
    """
    rows = jnp.take(x_band, send_idx, axis=0)
    if pre is not None:
        rows = pre(rows)
    out_dtype = rows.dtype
    if wire_dtype is not None:
        wmax = float(jnp.finfo(wire_dtype).max)
        if wmax < float(jnp.finfo(out_dtype).max):
            rows = jnp.clip(rows, -wmax, wmax)
        rows = rows.astype(wire_dtype)
    return rows, out_dtype


def _exchange_halo_ragged(sizes, n_shards, plan_arrays, x_band,
                          axis_name, pre=None, wire_dtype=None):
    """Per-offset ppermute exchange -> (8 + sum(sizes), k) halo table.

    The leading 8 rows are zeros (padding-edge target). One gather covers
    every send segment; the per-offset ring shifts are independent, so
    XLA is free to overlap them (and, in the overlap variants, to run
    them behind the interior aggregation).

    ``pre`` (optional) is applied to the GATHERED send rows before the
    collectives launch — the boundary-rows-first trick: when the caller
    passes ``rows -> rows @ W``, the exchanged payload is the (narrow)
    transformed rows and the collective's only data dependency is a
    small gather + small matmul, so the full-band ``X @ W`` and the
    interior aggregation are both free to run UNDER the exchange
    (dist_spmm_halo_ell_overlap_xw).

    ``wire_dtype`` (optional, e.g. jnp.bfloat16) casts the payload for
    the collectives only — bytes on the wire halve, the halo table is
    cast back to the compute dtype on arrival. One rounding step on
    boundary rows; the weak-scaling projection shows the multi-host
    regime is DCN-byte-bound, which is exactly what this trades against.
    """
    send_idx, _ = plan_arrays
    rows, out_dtype = _prep_send(x_band, send_idx.reshape(-1), pre,
                                 wire_dtype)
    parts = [jnp.zeros((8, rows.shape[1]), rows.dtype)]
    off = 0
    for t, h in enumerate(sizes, start=1):
        if h == 0:
            continue
        perm = [(s, (s + t) % n_shards) for s in range(n_shards)]
        parts.append(jax.lax.ppermute(rows[off:off + h], axis_name, perm))
        off += h
    return jnp.concatenate(parts, axis=0).astype(out_dtype)


def _exchange_halo_hier(intra_sizes, inter_sizes, fan_sizes, n_hosts,
                        n_chips, plan_arrays, x_band, axis_name,
                        pre=None, wire_dtype=None):
    """Two-level exchange (HierHaloPlan): ragged chip-offset ppermutes
    for same-host boundaries, then per-host-offset ppermutes of the
    UNION rows over the host axis (DCN) and an ICI fan-out of the
    received unions over the chip axis — ragged per-(host offset, chip
    offset) forwards of just the needed subsets when ``fan_sizes`` is
    set, else one full all_gather. ``axis_name`` must be the (host,
    chip) tuple. ``pre`` / ``wire_dtype`` as in _exchange_halo_ragged
    (applied to both send sets; wire_dtype halves DCN union bytes AND
    the ICI fan-out bytes)."""
    host_axis, chip_axis = axis_name
    send_intra, send_inter, send_fan, _ = plan_arrays
    rows_i, out_dtype = _prep_send(x_band, send_intra.reshape(-1), pre,
                                   wire_dtype)
    parts = [jnp.zeros((8, rows_i.shape[1]), rows_i.dtype)]
    off = 0
    for t, h in enumerate(intra_sizes, start=1):
        if h == 0:
            continue
        perm = [(c, (c + t) % n_chips) for c in range(n_chips)]
        parts.append(jax.lax.ppermute(rows_i[off:off + h], chip_axis,
                                      perm))
        off += h
    rows_e, _ = _prep_send(x_band, send_inter.reshape(-1), pre,
                           wire_dtype)
    recvs = []
    off = 0
    for th, h in enumerate(inter_sizes, start=1):
        if h == 0:
            continue
        perm = [(hh, (hh + th) % n_hosts) for hh in range(n_hosts)]
        recvs.append(jax.lax.ppermute(rows_e[off:off + h], host_axis,
                                      perm))
        off += h
    if recvs:
        inter = (recvs[0] if len(recvs) == 1
                 else jnp.concatenate(recvs, axis=0))
        if fan_sizes is None:
            # full fan-out: every chip gets every union its same-host
            # peers received (chip-major layout, matching col_remap)
            parts.append(jax.lax.all_gather(inter, chip_axis, axis=0,
                                            tiled=True))
        else:
            # ragged fan-out: the received-union buffer is readable
            # in place (tc == 0 edges), then per (host offset, chip
            # offset) only the destination's needed subset moves
            parts.append(inter)
            rows_f = jnp.take(inter, send_fan.reshape(-1), axis=0)
            off_f = 0
            i = 0
            for th in range(1, n_hosts):
                for tc in range(1, n_chips):
                    h = fan_sizes[i]
                    i += 1
                    if h == 0:
                        continue
                    perm = [(c, (c + tc) % n_chips)
                            for c in range(n_chips)]
                    parts.append(jax.lax.ppermute(
                        rows_f[off_f:off_f + h], chip_axis, perm))
                    off_f += h
    return jnp.concatenate(parts, axis=0).astype(out_dtype)


def make_halo_exchange(plan, wire_dtype=None):
    """exchange(plan_arrays, x_band, axis_name) -> halo rows, for any
    plan flavor (static metadata rides the closure; arrays stay jit
    arguments). For HierHaloPlan, axis_name must be the (host, chip)
    axis-name tuple. ``wire_dtype`` (e.g. jnp.bfloat16) casts the
    payload for the collectives only — see _exchange_halo_ragged."""
    if isinstance(plan, HierHaloPlan):
        return partial(_exchange_halo_hier, plan.intra_sizes,
                       plan.inter_sizes, plan.fan_sizes, plan.n_hosts,
                       plan.n_chips, wire_dtype=wire_dtype)
    if isinstance(plan, RaggedHaloPlan):
        return partial(_exchange_halo_ragged, plan.sizes, plan.n_shards,
                       wire_dtype=wire_dtype)
    return partial(_exchange_halo, wire_dtype=wire_dtype)


def dist_spmm_halo(shard_arrays, plan_arrays, x_band: jnp.ndarray,
                   rows_per_shard: int, axis_name: str = "data",
                   exchange=None) -> jnp.ndarray:
    """SpMM of the local row band with boundary-only exchange.

    Must be called inside shard_map over ``axis_name``. shard_arrays is the
    per-device (rows_local, cols_unused, vals); plan_arrays the per-device
    (send_idx, col_remap) with an optional leading length-1 shard axis.
    ``exchange`` is a ``make_halo_exchange`` closure (defaults to the
    padded all_to_all for HaloPlan-shaped arrays).
    """
    rows_local, _, vals = shard_arrays
    rows_local = rows_local.reshape(-1)
    vals = vals.reshape(-1)
    col_remap = plan_arrays[-1].reshape(-1)    # (e_max,)

    halo = (exchange or _exchange_halo)(plan_arrays, x_band, axis_name)
    table = jnp.concatenate([halo, x_band], axis=0)

    gathered = jnp.take(table, col_remap, axis=0) * vals[:, None].astype(
        x_band.dtype)
    return jax.ops.segment_sum(gathered, rows_local,
                               num_segments=rows_per_shard,
                               indices_are_sorted=True)


# ---------------------------------------------------------------------------
# ELL-kernel variant: the local band aggregation runs through the packed
# Pallas SpMM (gcn_tpu.ops.ell_spmm) instead of segment_sum. The per-shard
# matrix is the (rows_per_shard x table) band with columns remapped into
# concat(halo, own band); its EllAdj carries explicit transpose arrays, so
# the custom VJP produces d(table) and JAX differentiates the surrounding
# concat / all_to_all / send-gather automatically.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def unpermute_rows(y: jnp.ndarray, take_idx: jnp.ndarray,
                   back_idx: jnp.ndarray) -> jnp.ndarray:
    """``y[take_idx]`` with a gather-only gradient.

    The per-part row sort (build_sharded_ell ``part_order``) computes the
    part SpMM in part-degree-sorted row order; this restores band order.
    jnp.take's autodiff gradient is a scatter-add — correct but slow on
    TPU — so the vjp is expressed as the inverse gather instead
    (``back_idx`` = the forward permutation, take_idx's inverse).
    """
    return jnp.take(y, take_idx, axis=0)


def _unpermute_rows_fwd(y, take_idx, back_idx):
    return jnp.take(y, take_idx, axis=0), back_idx


def _unpermute_rows_bwd(back_idx, ct):
    # integer index args get float0 cotangents (non-differentiable)
    z = np.zeros(back_idx.shape, dtype=jax.dtypes.float0)
    return jnp.take(ct, back_idx, axis=0), z, z


unpermute_rows.defvjp(_unpermute_rows_fwd, _unpermute_rows_bwd)


def build_sharded_ell(sg: ShardedGraph, plan: HaloPlan, *, r: int = None,
                      k_pad: int = 32, products_bf16: bool = False,
                      part: str = "all", span_pass_limit: int = None,
                      table_bf16: bool = False, part_order: bool = False):
    """Per-shard EllAdj over the halo-remapped band matrices, stacked on a
    leading shard axis.

    part: "all" — one matrix over concat(halo, band) (t_cols = ns*H+rps);
    "interior" — only on-band edges, columns renumbered into [0, rps)
    (gathers straight from x_band, independent of the exchange);
    "boundary" — only off-band edges over the halo region [0, ns*H).
    interior+boundary splits let XLA overlap the all_to_all with the
    interior aggregation (dist_spmm_halo_ell_overlap).

    Lockstep layout (round 4): every shard is laid out with the SAME
    per-window pass counts (elementwise max across shards, then the
    <=48-value pass ladder when over the segment budget), so block
    indices, ``win``, and the grouped-reduce SPANS are shard-uniform —
    the stacked adjacency carries ``spans``/``t_spans`` and the in-
    shard_map kernel takes the fused grouped-XLA reduce instead of the
    products-materializing Pallas fallback (and wide features take the
    k_pad=128 single-gather-pass path). Under band_degree_sort_order
    per-band degrees are sorted, so the cross-shard max stays
    nonincreasing and the lockstep padding is small (the same balance
    argument as the halo plan's lockstep byte accounting,
    docs/RESULTS_r4.md). hub_split stays off: per-shard virtual row
    spaces would differ and cannot stack; band hubs keep the merged
    Pallas hub region.

    ``part_order`` (parts only, round 5): sort each band's rows by PART
    degree before tiling. The shared in-band order serves TOTAL degree,
    so a part's per-window degree variance is large — measured
    0.51/0.50 slot padding on 8-shard arxiv at P=1 vs 0.27/0.36
    part-sorted (parts total 4.70M -> 3.43M slots,
    docs/RESULTS_r5.md). Returns ``(adj, take_idx, back_idx)`` instead
    of ``adj``: the part output is in sorted order and must be restored
    with ``unpermute_rows(out, take_idx[d], back_idx[d])`` (the two
    parts' outputs then add in band order).
    """
    assert not (part_order and part == "all"), \
        "part_order applies to interior/boundary parts"
    from gcn_tpu.graph.csr import coo_to_csr
    from gcn_tpu.tile.ell import (DEFAULT_K_PAD, DEFAULT_R, EllAdj,
                                  _MAX_REDUCE_SEGMENTS, _ell_arrays,
                                  _guard_spans, _quantize_passes,
                                  _span_plan, _window_passes)

    ns, rps = sg.n_shards, sg.rows_per_shard
    if r is None:
        # match the single-chip tiler's window height (the round-4
        # sharded-rate bench measured r=64 per-shard windows ~1.3x
        # slower than the plain r=128 layout at arxiv scale), but never
        # exceed the band height
        r = DEFAULT_R if rps >= DEFAULT_R else max(8, rps // 8 * 8)
    p = 128 // k_pad
    if span_pass_limit is None:
        env = os.environ.get("GCN_TPU_SPAN_LIMIT")
        span_pass_limit = (int(env) if env is not None
                           else max(1, k_pad // 2))
    if span_pass_limit <= 0:
        span_pass_limit = 1 << 30
    halo_cols = plan.halo_rows
    if part == "all":
        t_cols = halo_cols + rps
    elif part == "interior":
        t_cols = rps
    else:
        assert part == "boundary"
        t_cols = halo_cols
    locals_, transposes = [], []
    takes, backs = [], []
    for d in range(ns):
        vals = np.asarray(sg.vals[d])
        remap = np.asarray(plan.col_remap[d])
        real = vals != 0
        if part == "interior":
            real = real & (remap >= halo_cols)
            cols_d = remap - halo_cols
        elif part == "boundary":
            real = real & (remap < halo_cols)
            cols_d = remap
        else:
            cols_d = remap
        rows_d = np.asarray(sg.rows_local[d])[real]
        if part_order:
            deg = np.bincount(rows_d, minlength=rps)
            perm = np.argsort(-deg, kind="stable").astype(np.int32)
            rank = np.empty(rps, dtype=np.int32)
            rank[perm] = np.arange(rps, dtype=np.int32)
            rows_d = rank[rows_d]
            takes.append(rank)     # out_band[old] = out_sorted[rank[old]]
            backs.append(perm)     # ct_sorted[new] = ct_band[perm[new]]
        g_local = coo_to_csr(
            rows_d,
            cols_d[real],
            vals[real], (rps, t_cols))
        locals_.append(g_local)
        transposes.append(g_local.transpose())

    def shared_passes(graphs, n):
        ps = np.maximum.reduce(
            [_window_passes(g.indptr, n, r, p) for g in graphs])
        if (len(np.unique(ps)) > _MAX_REDUCE_SEGMENTS
                and bool((np.diff(ps) <= 0).all())):
            ps = _quantize_passes(ps, _MAX_REDUCE_SEGMENTS)
        return ps

    pf = shared_passes(locals_, rps)
    pt = shared_passes(transposes, t_cols)

    def layout(graphs, n, forced):
        cols, vals_a, wins = [], [], []
        off = None
        for g in graphs:
            c, v, w, off = _ell_arrays(g.indptr, g.indices, g.data, n, r,
                                       p, forced_passes=forced)
            cols.append(c)
            vals_a.append(v)
            wins.append(w)
        spans = _guard_spans(_span_plan(off), span_pass_limit)
        return (jnp.asarray(np.stack(cols)), jnp.asarray(np.stack(vals_a)),
                jnp.asarray(wins[0]), spans)

    cols_s, vals_s, win_s, spans = layout(locals_, rps, pf)
    t_cols_s, t_vals_s, t_win_s, t_spans = layout(transposes, t_cols, pt)

    nw = -(-rps // r)
    adj = EllAdj(
        cols=cols_s, vals=vals_s,
        # win is shard-uniform by construction; broadcast to the stacked
        # shape so shard_map in_specs see a consistent leading axis
        win=jnp.broadcast_to(win_s, (ns,) + win_s.shape),
        t_cols=t_cols_s, t_vals=t_vals_s,
        t_win=jnp.broadcast_to(t_win_s, (ns,) + t_win_s.shape),
        n_rows=rps, n_cols=t_cols, nnz=locals_[0].nnz, r=r,
        k_pad=k_pad, symmetric=False, products_bf16=products_bf16,
        chunks=((0, int(cols_s.shape[1]), 0, nw),),
        t_chunks=((0, int(t_cols_s.shape[1]), 0, -(-t_cols // r)),),
        spans=spans, t_spans=t_spans, table_bf16=table_bf16,
        span_pass_limit=span_pass_limit)
    if part_order:
        return adj, jnp.asarray(np.stack(takes)), jnp.asarray(
            np.stack(backs))
    return adj


def _fit_counts(counts: np.ndarray, budget: int = None) -> np.ndarray:
    """Make a per-window block-count sequence span-budget-friendly:
    identity if its runs already fit, else the nonincreasing envelope
    (reverse cummax) laddered to the segment budget (tile/ell.py).

    ``budget`` tightens the default 48-segment ladder. Measured (round
    5, k128 arxiv isolation, same session): budget 16 (+4% slots,
    71 -> 30 segments) runs within noise of budget 48 (1.221 vs 1.234x
    plain) — segment-count overhead is NOT the partition's residual
    cost, so the default stays the least-padded 48. (Cross-session
    relay drift on this multi-jit isolation is ~15%; ratios are only
    comparable within a session.)
    """
    from gcn_tpu.tile.ell import (_MAX_REDUCE_SEGMENTS, _pass_runs,
                                  _quantize_passes)

    budget = budget or _MAX_REDUCE_SEGMENTS
    if (len(np.unique(counts)) <= budget
            and _pass_runs(counts) <= budget):
        return counts
    mono = np.maximum.accumulate(counts[::-1])[::-1]
    if len(np.unique(mono)) > budget:
        mono = _quantize_passes(mono, budget)
    return mono


def build_sharded_ell_blocks(sg: ShardedGraph, plan: HaloPlan, *,
                             r: int = None, k_pad: int = 32,
                             span_pass_limit: int = None,
                             products_bf16: bool = False,
                             table_bf16: bool = False,
                             part_segment_budget: int = None):
    """Pass-BLOCK partition of the monolithic lockstep layout:
    ``(adj_interior, adj_halo)`` whose slots UNION equals the monolithic
    table's (round-5 design; docs/RESULTS_r5.md).

    The overlap row-split (part="interior"/"boundary") pays 1.34-1.51x
    the plain kernel: splitting each ROW's edges into two matrices
    doubles the per-window max-degree padding. But within the monolithic
    layout a row's columns sort ascending and halo ids precede band ids,
    so every halo edge lives in the FIRST slots of its row; per window,
    pass-blocks below ``ceil(max_halo_degree / P)`` are the only ones
    touching the halo. Cutting the monolithic block sequence there
    yields an interior-only kernel (gathers straight from x_band —
    launchable BEFORE the exchange completes) and a halo kernel (gathers
    from concat(halo, band)), at monolithic slot cost plus only a
    >=1-block floor for windows absent from one side.

    Both parts share the band row order (no un-permute) and the
    lockstep shard-uniform layout. Outputs add: out = interior + halo.
    """
    from gcn_tpu.graph.csr import coo_to_csr
    from gcn_tpu.tile.ell import (DEFAULT_R, EllAdj, _ell_arrays,
                                  _guard_spans, _span_plan,
                                  _window_passes)

    ns, rps = sg.n_shards, sg.rows_per_shard
    if r is None:
        r = DEFAULT_R if rps >= DEFAULT_R else max(8, rps // 8 * 8)
    p = 128 // k_pad
    if span_pass_limit is None:
        env = os.environ.get("GCN_TPU_SPAN_LIMIT")
        span_pass_limit = (int(env) if env is not None
                           else max(1, k_pad // 2))
    if span_pass_limit <= 0:
        span_pass_limit = 1 << 30
    halo_cols = plan.halo_rows
    nw = max(1, -(-rps // r))

    # per-shard monolithic CSRs + per-row halo degrees
    g_all, halo_deg = [], []
    for d in range(ns):
        vals = np.asarray(sg.vals[d])
        remap = np.asarray(plan.col_remap[d])
        real = vals != 0
        rows_d = np.asarray(sg.rows_local[d])[real]
        cols_d = remap[real]
        g_all.append(coo_to_csr(rows_d, cols_d, vals[real],
                                (rps, halo_cols + rps)))
        halo_deg.append(np.bincount(rows_d[cols_d < halo_cols],
                                    minlength=rps).astype(np.int64))

    # lockstep totals and halo cut, shard-uniform
    pf = _fit_counts(np.maximum.reduce(
        [_window_passes(g.indptr, rps, r, p) for g in g_all]))
    hb = np.zeros(nw, dtype=np.int64)
    for d in range(ns):
        hd = np.zeros(nw * r, dtype=np.int64)
        hd[:rps] = halo_deg[d]
        hb = np.maximum(hb, -(-hd.reshape(nw, r).max(axis=1) // p))
    hb = np.minimum(hb, pf)
    hp = _fit_counts(np.maximum(hb, 1),
                     part_segment_budget)          # halo-part blocks
    ip = _fit_counts(np.maximum(pf - hb, 1),
                     part_segment_budget)          # interior-part blocks

    def layout_part(which, counts, n_cols_part):
        offs = np.zeros(nw + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        nb = int(offs[-1])
        cols_a = np.zeros((ns, nb, p, r), dtype=np.int32)
        vals_a = np.zeros((ns, nb, p, r), dtype=np.float32)
        for d in range(ns):
            g = g_all[d]
            deg = np.diff(g.indptr).astype(np.int64)
            e = len(g.indices)
            rows = np.repeat(np.arange(rps, dtype=np.int64), deg)
            j = np.arange(e, dtype=np.int64) - np.repeat(
                g.indptr[:-1].astype(np.int64), deg)
            w = rows // r
            cut = hb[w] * p
            if which == "halo":
                m = j < cut
                jj = j[m]
                blk = offs[w[m]] + jj // p
                cc = g.indices[m]
            else:
                m = j >= cut
                jj = j[m] - cut[m]
                blk = offs[w[m]] + jj // p
                cc = g.indices[m] - halo_cols
            cols_a[d, blk, jj % p, rows[m] - w[m] * r] = cc
            vals_a[d, blk, jj % p, rows[m] - w[m] * r] = g.data[m]
        win = np.repeat(np.arange(nw, dtype=np.int32),
                        counts).astype(np.int32)
        spans = _guard_spans(_span_plan(offs), span_pass_limit)
        return cols_a, vals_a, win, spans, offs

    def layout_transpose(which, n_rows_t):
        # transpose CSRs per shard from the part's edge set
        t_list = []
        for d in range(ns):
            g = g_all[d]
            deg = np.diff(g.indptr).astype(np.int64)
            e = len(g.indices)
            rows = np.repeat(np.arange(rps, dtype=np.int64), deg)
            j = np.arange(e, dtype=np.int64) - np.repeat(
                g.indptr[:-1].astype(np.int64), deg)
            cut = hb[rows // r] * p
            if which == "halo":
                m = j < cut
                cc = g.indices[m]
            else:
                m = j >= cut
                cc = g.indices[m] - halo_cols
            t_list.append(coo_to_csr(cc, rows[m], g.data[m],
                                     (n_rows_t, rps)))
        pt = _fit_counts(np.maximum.reduce(
            [_window_passes(t.indptr, n_rows_t, r, p) for t in t_list]))
        cols, vals_a, wins = [], [], []
        off = None
        for t in t_list:
            c, v, w_, off = _ell_arrays(t.indptr, t.indices, t.data,
                                        n_rows_t, r, p, forced_passes=pt)
            cols.append(c)
            vals_a.append(v)
            wins.append(w_)
        spans = _guard_spans(_span_plan(off), span_pass_limit)
        return (np.stack(cols), np.stack(vals_a), wins[0], spans, off)

    adjs = []
    for which, counts, n_cols_part in (
            ("interior", ip, rps), ("halo", hp, halo_cols + rps)):
        cols_a, vals_a, win, spans, offs = layout_part(
            which, counts, n_cols_part)
        t_cols_a, t_vals_a, t_win, t_spans, t_off = layout_transpose(
            which, n_cols_part)
        nnz_d = int((vals_a[0] != 0).sum())
        adjs.append(EllAdj(
            cols=jnp.asarray(cols_a), vals=jnp.asarray(vals_a),
            win=jnp.broadcast_to(jnp.asarray(win),
                                 (ns,) + win.shape),
            t_cols=jnp.asarray(t_cols_a), t_vals=jnp.asarray(t_vals_a),
            t_win=jnp.broadcast_to(jnp.asarray(t_win),
                                   (ns,) + t_win.shape),
            n_rows=rps, n_cols=n_cols_part, nnz=nnz_d, r=r,
            k_pad=k_pad, symmetric=False, products_bf16=products_bf16,
            chunks=((0, int(cols_a.shape[1]), 0, nw),),
            t_chunks=((0, int(t_cols_a.shape[1]), 0,
                       -(-n_cols_part // r)),),
            spans=spans, t_spans=t_spans, table_bf16=table_bf16,
            span_pass_limit=span_pass_limit))
    return adjs[0], adjs[1]


def dist_spmm_halo_ell_overlap_blocks(ell_int, ell_halo, plan_arrays,
                                      x_band: jnp.ndarray,
                                      axis_name: str = "data",
                                      exchange=None) -> jnp.ndarray:
    """Overlap via the pass-block partition: the interior-only kernel
    gathers straight from the band and runs UNDER the exchange; the
    halo kernel covers the remaining blocks of the same monolithic
    layout over concat(halo, band). Monolithic slot cost, split-style
    overlap."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    halo = (exchange or _exchange_halo)(plan_arrays, x_band, axis_name)
    interior = spmm_ell(ell_int, x_band)
    table = jnp.concatenate([halo, x_band], axis=0)
    return interior + spmm_ell(ell_halo, table)


def dist_spmm_halo_ell_overlap_blocks_xw(ell_int, ell_halo, plan_arrays,
                                         x_band: jnp.ndarray,
                                         w: jnp.ndarray,
                                         axis_name: str = "data",
                                         exchange=None,
                                         chunk: int = None) -> jnp.ndarray:
    """Fused A @ (X W) on the pass-block partition with the
    boundary-rows-first exchange and optional k-chunk pipelining (the
    dist_spmm_halo_ell_overlap_xw docstring's levers on the
    monolithic-cost split)."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    ex = exchange or _exchange_halo
    f_out = w.shape[1]
    h = jnp.dot(x_band, w, preferred_element_type=x_band.dtype)
    interior = spmm_ell(ell_int, h)
    if chunk is None or f_out <= chunk:
        def pre(rows):
            return jnp.dot(rows, w, preferred_element_type=rows.dtype)

        halo = ex(plan_arrays, x_band, axis_name, pre=pre)
        return interior + spmm_ell(ell_halo,
                                   jnp.concatenate([halo, h], axis=0))

    parts = []
    for c0 in range(0, f_out, chunk):
        c1 = min(c0 + chunk, f_out)
        wc = jax.lax.slice_in_dim(w, c0, c1, axis=1)

        def pre_c(rows, wc=wc):
            return jnp.dot(rows, wc, preferred_element_type=rows.dtype)

        halo_c = ex(plan_arrays, x_band, axis_name, pre=pre_c)
        hc = jax.lax.slice_in_dim(h, c0, c1, axis=1)
        parts.append(spmm_ell(ell_halo,
                              jnp.concatenate([halo_c, hc], axis=0)))
    return interior + jnp.concatenate(parts, axis=1)


def unstack_ell_shard(adj_stacked):
    """Inside shard_map: drop the leading (length-1) shard axis."""
    from gcn_tpu.tile.ell import EllAdj

    sq = {f: getattr(adj_stacked, f).reshape(getattr(adj_stacked, f).shape[1:])
          for f in ("cols", "vals", "win", "t_cols", "t_vals", "t_win")}
    return EllAdj(**sq, n_rows=adj_stacked.n_rows, n_cols=adj_stacked.n_cols,
                  nnz=adj_stacked.nnz, r=adj_stacked.r,
                  k_pad=adj_stacked.k_pad, symmetric=False,
                  chunks=adj_stacked.chunks, t_chunks=adj_stacked.t_chunks,
                  products_bf16=adj_stacked.products_bf16,
                  spans=adj_stacked.spans, t_spans=adj_stacked.t_spans,
                  table_bf16=adj_stacked.table_bf16,
                  span_pass_limit=adj_stacked.span_pass_limit)


def _exchange_halo(plan_arrays, x_band, axis_name, pre=None,
                   wire_dtype=None):
    send_idx, _ = plan_arrays
    ns_h = tuple(send_idx.shape[-2:])
    send, out_dtype = _prep_send(x_band, send_idx.reshape(-1), pre,
                                 wire_dtype)
    send = send.reshape(ns_h + (send.shape[1],))
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0)
    return recv.reshape(ns_h[0] * ns_h[1], recv.shape[-1]).astype(out_dtype)


def dist_spmm_halo_ell(ell_shard, plan_arrays, x_band: jnp.ndarray,
                       axis_name: str = "data",
                       exchange=None) -> jnp.ndarray:
    """Pallas-ELL SpMM of the local band with boundary-only exchange.

    Must be called inside shard_map; ell_shard is the per-device EllAdj
    (already unstacked), plan_arrays / exchange as in dist_spmm_halo."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    halo = (exchange or _exchange_halo)(plan_arrays, x_band, axis_name)
    table = jnp.concatenate([halo, x_band], axis=0)
    return spmm_ell(ell_shard, table)


def dist_spmm_halo_ell_overlap(ell_interior, ell_boundary, plan_arrays,
                               x_band: jnp.ndarray,
                               axis_name: str = "data",
                               exchange=None, int_unperm=None,
                               bnd_unperm=None) -> jnp.ndarray:
    """Overlapped variant: interior aggregation has no data dependency on
    the exchange collectives, so XLA's async-collective scheduler can run
    them behind it (the halo-overlap BASELINE.md calls for):

        halo     = exchange(boundary rows)        # async on TPU
        interior = A_int  @ x_band                # overlaps the exchange
        boundary = A_bnd  @ halo
        out      = interior + boundary

    ``int_unperm``/``bnd_unperm``: (take_idx, back_idx) pairs from
    ``build_sharded_ell(part_order=True)`` — each part computes in its
    own part-degree-sorted row order (~27% fewer gather slots on
    8-shard arxiv) and is restored to band order before the add.
    """
    from gcn_tpu.ops.ell_spmm import spmm_ell

    halo = (exchange or _exchange_halo)(plan_arrays, x_band, axis_name)
    interior = spmm_ell(ell_interior, x_band)
    if int_unperm is not None:
        interior = unpermute_rows(interior, *int_unperm)
    boundary = spmm_ell(ell_boundary, halo)
    if bnd_unperm is not None:
        boundary = unpermute_rows(boundary, *bnd_unperm)
    return interior + boundary


def dist_spmm_halo_ell_overlap_xw(ell_interior, ell_boundary, plan_arrays,
                                  x_band: jnp.ndarray, w: jnp.ndarray,
                                  axis_name: str = "data",
                                  exchange=None,
                                  chunk: int = None, int_unperm=None,
                                  bnd_unperm=None) -> jnp.ndarray:
    """Fused ``A @ (X W)`` with a boundary-rows-first exchange.

    dist_spmm_halo_ell_overlap hides the exchange behind the interior
    aggregation only: its collective input is gathered from the ALREADY
    transformed band, so the full (n_band x nfeat x nhid) matmul sits on
    the collective's critical path. Here the send rows are gathered from
    the RAW band and transformed by a small (halo_rows x nfeat x nhid)
    matmul inside the exchange (the ``pre`` hook), so the collective
    launches immediately and BOTH the full-band transform and the
    interior aggregation run under it:

        halo     = exchange(gather(x) @ w)    # small dot, async collective
        h        = x @ w                      # big dot — overlaps exchange
        interior = A_int @ h                  #           overlaps exchange
        boundary = A_bnd @ halo
        out      = interior + boundary

    The boundary rows' transform is computed twice (once in the send
    path, once inside the big dot) — halo_rows/n_band extra MXU work,
    a fraction of a percent at production shard sizes — and the result
    is the same function of (x, w) as transform-then-exchange, so
    gradients match the unfused path (pinned in tests/test_parallel.py).
    This is the widened overlap window the weak-scaling projection
    (docs/RESULTS_r3.md) identifies as the multi-host lever: on the
    8-shard arxiv plan the exchange can hide behind ~n_band*nfeat*nhid
    MXU flops instead of interior-gather time alone.

    ``chunk`` (round 4): k-chunked PIPELINED exchange. Each output
    column of the boundary aggregation depends only on that column of
    the halo, so the exchange and the boundary SpMM split cleanly along
    the feature dimension into ceil(f_out/chunk) independent slices:

        for c in chunks:  halo_c = exchange(gather(x) @ w[:, c])
                          boundary[:, c] = A_bnd @ halo_c

    The slices' collectives are mutually independent and each slice's
    boundary aggregation depends only on its own collective, so XLA's
    async-collective scheduler can aggregate slice c while slice c+1 is
    still on the wire — the boundary aggregation itself (the one piece
    of compute the monolithic form can never overlap, (1-interior) of
    the SpMM) now hides up to (C-1)/C of the exchange. The full-step
    weak-scaling projection (parallel/projection.py) models exactly
    this window; exposed time drops from max(0, t_comm - t_int) to
    max(0, t_comm - t_int - (C-1)/C * t_bnd). Numerically identical to
    the monolithic form: concat_c(A_bnd @ halo[:, c]) == A_bnd @ halo
    column-exactly, and the bf16 wire rounds rows @ w[:, c] to the same
    values as (rows @ w)[:, c] (pinned in tests/test_parallel.py).
    chunk should match the ELL kernel's k_pad (32) so each slice is one
    native kernel tile."""
    from gcn_tpu.ops.ell_spmm import spmm_ell

    ex = exchange or _exchange_halo
    f_out = w.shape[1]
    h = jnp.dot(x_band, w, preferred_element_type=x_band.dtype)
    interior = spmm_ell(ell_interior, h)
    if int_unperm is not None:
        interior = unpermute_rows(interior, *int_unperm)

    def bnd(halo_part):
        out = spmm_ell(ell_boundary, halo_part)
        if bnd_unperm is not None:
            out = unpermute_rows(out, *bnd_unperm)
        return out

    if chunk is None or f_out <= chunk:
        def pre(rows):
            return jnp.dot(rows, w, preferred_element_type=rows.dtype)

        halo = ex(plan_arrays, x_band, axis_name, pre=pre)
        return interior + bnd(halo)

    bnd_parts = []
    for c0 in range(0, f_out, chunk):
        wc = jax.lax.slice_in_dim(w, c0, min(c0 + chunk, f_out), axis=1)

        def pre_c(rows, wc=wc):
            return jnp.dot(rows, wc, preferred_element_type=rows.dtype)

        halo_c = ex(plan_arrays, x_band, axis_name, pre=pre_c)
        bnd_parts.append(bnd(halo_c))
    return interior + jnp.concatenate(bnd_parts, axis=1)
