"""Weak-scaling projection (gcn_tpu/parallel/projection.py).

The byte counts come from the real halo planners (exactness pinned in
tests/test_parallel.py); here we pin the model layer: efficiency bounds,
bandwidth monotonicity, and that the hierarchical plan's DCN volume
never exceeds the flat plan's cross-host volume.
"""

import pytest

from gcn_tpu.parallel.projection import project_weak_scaling


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
