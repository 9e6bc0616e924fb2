"""Analytic weak-scaling projection from measured exchange volumes.

BASELINE.md's >=90% weak-scaling target is defined at 2+ hosts; this
container has ONE chip, so the target cannot be measured here (see
docs/ROADMAP.md). What CAN be produced without the hardware — and what
this module does — is the exact, not modeled, per-device communication
volume: the halo planners (`parallel/halo.py`) run on host numpy at any
shard count, so the rows each device ships per SpMM over ICI and DCN are
computed from the real plans on a weak-scaled graph run through the real
pipeline (rabbit reorder -> in-band degree sort -> row-band shards).
Only the TIME conversion is a model:

    t_comp  = edges_per_device / spmm_rate          (measured, bench.py)
    t_comm  = ici_bytes / bw_ici + dcn_bytes / bw_dcn
    exposed = max(0, t_comm - overlap_frac * t_comp)
    eff     = t_comp / (t_comp + exposed)

where overlap_frac is the interior-edge fraction (the overlap split in
`halo.dist_spmm_halo_ell_overlap` hides the exchange behind interior
aggregation). Every efficiency is reported at 0.5x/1x/2x the assumed
link bandwidths, plus the minimum effective bandwidth at which the
>=90% target holds — the bandwidth numbers are ASSUMPTIONS
(CLI-overridable; defaults in `DEFAULTS` below), the byte counts are not.

Flat multi-host exchanges are charged entirely at DCN rate: each ring
offset is one lockstep ppermute, and once shards span hosts essentially
every offset contains at least one cross-host pair, so the collective
completes at the slowest link's rate. This is precisely the regime the
hierarchical plan (`build_halo_plan_hier`) exists for.

Reference context: the CUDA reference is single-GPU (SURVEY.md §5 —
no distributed subsystem); multi-chip scaling is this framework's
beyond-reference capability, so the projection quantifies a capability
the reference cannot express at all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

# Assumption defaults. bw_* are per-chip effective one-direction
# bandwidths in bytes/s: ICI from public v5e figures (2 torus axes in
# flight), DCN from a 400 Gbps host NIC shared by chips_per_host chips.
# spmm_edges_per_s is bench.py's measured arxiv k=32 rate (RESULTS_r3).
DEFAULTS = dict(
    chips_per_host=8,
    feat_width=32,
    bytes_per_elt=4,
    spmm_edges_per_s=346e6,
    bw_ici=9.0e10,
    bw_dcn=6.25e9,
)

BW_SCALES = (0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class ProjectionRow:
    """Exchange volumes (exact) + modeled efficiencies for one d."""

    devices: int
    hosts: int
    n_rows: int
    edges_per_device: int        # max real slots over shards (lockstep)
    boundary_edge_frac: float    # mean fraction of edges leaving the band
    flat_rows: int               # ragged plan rows/device/SpMM
    allgather_rows: int          # what a full all-gather would ship
    hier_ici_rows: int           # intra segments + union fan-out (0 if 1 host)
    hier_dcn_rows: int           # per-host union segments (0 if 1 host)
    eff_flat: dict               # {bw_scale: efficiency}
    eff_hier: Optional[dict]     # None on a single host
    min_bw_scale_90: float       # bandwidth scale where eff >= 0.9 (best plan)

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["eff_flat"] = {str(k): round(v, 4) for k, v in d["eff_flat"].items()}
        if d["eff_hier"] is not None:
            d["eff_hier"] = {
                str(k): round(v, 4) for k, v in d["eff_hier"].items()}
        d["boundary_edge_frac"] = round(d["boundary_edge_frac"], 4)
        d["min_bw_scale_90"] = round(d["min_bw_scale_90"], 3)
        return d


def _efficiency(t_comp, ici_bytes, dcn_bytes, overlap_frac,
                bw_ici, bw_dcn, scale):
    t_comm = ici_bytes / (bw_ici * scale) + dcn_bytes / (bw_dcn * scale)
    exposed = max(0.0, t_comm - overlap_frac * t_comp)
    return t_comp / (t_comp + exposed)


def _min_scale_for(target, t_comp, ici_bytes, dcn_bytes, overlap_frac,
                   bw_ici, bw_dcn):
    """Smallest joint bandwidth scale with eff >= target (closed form)."""
    base_comm = ici_bytes / bw_ici + dcn_bytes / bw_dcn
    if base_comm == 0:
        return 0.0
    # eff >= target  <=>  exposed <= t_comp*(1/target - 1)
    budget = t_comp * (1.0 / target - 1.0) + overlap_frac * t_comp
    if budget <= 0:
        return float("inf")
    return base_comm / budget


def project_weak_scaling(
    devices: Sequence[int],
    nodes_per_device: int = 8192,
    *,
    reorder: str = "rabbit",
    avg_degree: float = 14.0,
    seed: int = 0,
    chips_per_host: int = DEFAULTS["chips_per_host"],
    feat_width: int = DEFAULTS["feat_width"],
    bytes_per_elt: int = DEFAULTS["bytes_per_elt"],
    spmm_edges_per_s: float = DEFAULTS["spmm_edges_per_s"],
    bw_ici: float = DEFAULTS["bw_ici"],
    bw_dcn: float = DEFAULTS["bw_dcn"],
) -> list:
    """Build REAL halo plans at each device count on a weak-scaled SBM
    and convert the exchanged bytes to projected weak-scaling efficiency.

    Everything before the time conversion runs the production pipeline
    on host numpy — no TPU (or any jax device computation) is involved,
    which is the point: the planners' outputs are exact at pod-slice
    shard counts (tests/test_parallel.py::test_planners_scale_to_pod_slice).
    """
    from gcn_tpu.data.synthetic import sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.parallel.halo import (build_halo_plan_hier,
                                       build_halo_plan_ragged)
    from gcn_tpu.parallel.partition import (band_degree_sort_order,
                                            shard_graph_by_rows)
    from gcn_tpu.reorder import reorder_graph

    bytes_per_row = feat_width * bytes_per_elt
    rows = []
    for d in devices:
        n = nodes_per_device * d
        adj, _ = sbm(n=n, n_classes=max(8, d), avg_degree=avg_degree,
                     seed=seed)
        g = gcn_normalize(adj)
        if reorder:
            g, _ = reorder_graph(g, reorder)
        sg0 = shard_graph_by_rows(g, d)
        bperm = band_degree_sort_order(g, sg0.rows_per_shard)
        g = g.permute(bperm)
        sg = shard_graph_by_rows(g, d)

        vals = np.asarray(sg.vals)
        cols = np.asarray(sg.cols)
        real = vals != 0
        edges_dev = int(real.sum(axis=1).max())
        src_shard = cols // sg.rows_per_shard
        own = src_shard == np.arange(d)[:, None]
        nreal = max(int(real.sum()), 1)
        boundary_frac = float((real & ~own).sum() / nreal)
        overlap_frac = 1.0 - boundary_frac

        pr = build_halo_plan_ragged(sg)
        flat_rows = int(sum(pr.sizes))
        if d <= chips_per_host:
            hosts = 1
        elif d % chips_per_host == 0:
            hosts = d // chips_per_host
        else:
            # refuse rather than silently charging a multi-host slice
            # at ICI rate (a d=12, cph=8 run spans 2 hosts)
            raise ValueError(
                f"devices={d} exceeds chips_per_host={chips_per_host} "
                f"but does not divide it; pass a chips_per_host that "
                f"tiles the slice")
        t_comp = edges_dev / spmm_edges_per_s

        # flat plan: all-ICI on one host, all-DCN once shards span hosts
        flat_bytes = flat_rows * bytes_per_row
        flat_ici = flat_bytes if hosts == 1 else 0.0
        flat_dcn = 0.0 if hosts == 1 else flat_bytes
        eff_flat = {s: _efficiency(t_comp, flat_ici, flat_dcn,
                                   overlap_frac, bw_ici, bw_dcn, s)
                    for s in BW_SCALES}
        best = (flat_ici, flat_dcn)

        hier_ici_rows = hier_dcn_rows = 0
        eff_hier = None
        if hosts > 1:
            ph = build_halo_plan_hier(sg, hosts, chips_per_host)
            hier_ici_rows = int(sum(ph.intra_sizes)) + int(
                ph.ici_gather_rows)
            hier_dcn_rows = int(sum(ph.inter_sizes))
            h_ici = hier_ici_rows * bytes_per_row
            h_dcn = hier_dcn_rows * bytes_per_row
            eff_hier = {s: _efficiency(t_comp, h_ici, h_dcn, overlap_frac,
                                       bw_ici, bw_dcn, s)
                        for s in BW_SCALES}
            if eff_hier[1.0] >= eff_flat[1.0]:
                best = (h_ici, h_dcn)

        min_scale = _min_scale_for(0.9, t_comp, best[0], best[1],
                                   overlap_frac, bw_ici, bw_dcn)
        rows.append(ProjectionRow(
            devices=d, hosts=hosts, n_rows=n, edges_per_device=edges_dev,
            boundary_edge_frac=boundary_frac, flat_rows=flat_rows,
            allgather_rows=(d - 1) * sg.rows_per_shard,
            hier_ici_rows=hier_ici_rows, hier_dcn_rows=hier_dcn_rows,
            eff_flat=eff_flat, eff_hier=eff_hier,
            min_bw_scale_90=min_scale,
        ))
    return rows
