import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.data.synthetic import sbm, powerlaw_sbm
from gcn_tpu.graph.csr import coo_to_csr
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.ops.panel_spmm import spmm_panel
from gcn_tpu.tile import panel_adjacency


@pytest.fixture(scope="module")
def graph():
    g, _ = sbm(n=700, n_classes=5, avg_degree=9.0, seed=2)
    return gcn_normalize(g)


def test_tiler_invariants(graph):
    adj = panel_adjacency(graph)
    cols = np.asarray(adj.cols)
    vals = np.asarray(adj.vals)
    lrow = np.asarray(adj.local_row)
    base = np.asarray(adj.row_base)
    # nnz conservation
    real = lrow < adj.r
    assert int(real.sum()) == graph.nnz
    # padding entries are inert
    assert np.all(vals[~real] == 0)
    # all rows covered and within window
    assert np.all(lrow[real] >= 0)
    assert np.all(base % adj.r == 0)
    rows = (base[:, None] + lrow)[real]
    deg = np.bincount(rows, minlength=graph.shape[0])
    assert np.array_equal(deg[: graph.shape[0]], graph.row_degrees())
    # value conservation
    assert np.isclose(vals.sum(), graph.data.sum(), rtol=1e-5)


def test_tiler_matches_dense(graph):
    adj = panel_adjacency(graph)
    dense = np.zeros((graph.shape[0], graph.shape[1]), np.float32)
    cols = np.asarray(adj.cols)
    vals = np.asarray(adj.vals)
    lrow = np.asarray(adj.local_row)
    base = np.asarray(adj.row_base)
    real = lrow < adj.r
    rows = base[:, None] + np.minimum(lrow, adj.r - 1)
    np.add.at(dense, (rows[real], cols[real]), vals[real])
    assert np.allclose(dense, graph.to_dense(), atol=1e-6)


@pytest.mark.parametrize("k", [8, 32])
def test_panel_spmm_matches_dense(graph, k, rng):
    adj = panel_adjacency(graph)
    x = jnp.asarray(rng.standard_normal((graph.shape[0], k)).astype(np.float32))
    out = spmm_panel(adj, x)
    ref = graph.to_dense() @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_panel_spmm_grad(graph, rng):
    adj = panel_adjacency(graph)
    n = graph.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    dx = jax.grad(lambda xx: jnp.vdot(spmm_panel(adj, xx), cot))(x)
    ref = graph.to_dense().T @ np.asarray(cot)
    np.testing.assert_allclose(np.asarray(dx), ref, rtol=1e-4, atol=1e-5)


def test_panel_nonsymmetric(rng):
    g = coo_to_csr(rng.integers(0, 100, 400), rng.integers(0, 100, 400),
                   rng.random(400).astype(np.float32), (100, 100))
    adj = panel_adjacency(g)
    assert not adj.symmetric
    x = jnp.asarray(rng.standard_normal((100, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm_panel(adj, x)),
                               g.to_dense() @ np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    cot = jnp.asarray(rng.standard_normal((100, 8)).astype(np.float32))
    dx = jax.grad(lambda xx: jnp.vdot(spmm_panel(adj, xx), cot))(x)
    np.testing.assert_allclose(np.asarray(dx),
                               g.to_dense().T @ np.asarray(cot),
                               rtol=1e-4, atol=1e-5)


def test_powerlaw_hub_rows(rng):
    """Hub rows (degree > NB) must span multiple blocks and still be exact."""
    g, _ = powerlaw_sbm(n=2000, n_classes=4, avg_degree=20.0, seed=3)
    g = gcn_normalize(g)
    assert g.row_degrees().max() > 128  # has hubs
    adj = panel_adjacency(g)
    x = jnp.asarray(rng.standard_normal((2000, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm_panel(adj, x)),
                               g.to_dense() @ np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_pad_fraction_reasonable():
    g, _ = powerlaw_sbm(n=20000, n_classes=10, avg_degree=14.0, seed=4)
    adj = panel_adjacency(gcn_normalize(g))
    assert adj.pad_fraction < 0.35
