import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.graph.csr import coo_to_csr
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.ops.adjacency import coo_adjacency, dense_adjacency
from gcn_tpu.ops.spmm import spmm


def random_graph(rng, n=60, m=300, symmetric=False):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    vals = rng.random(m).astype(np.float32)
    g = coo_to_csr(src, dst, vals, (n, n))
    if symmetric:
        g = gcn_normalize(g.symmetrize())
    return g


@pytest.mark.parametrize("k", [1, 4, 32])
def test_coo_matches_dense(rng, k):
    g = random_graph(rng)
    x = jnp.asarray(rng.standard_normal((60, k)), dtype=jnp.float32)
    out_dense = spmm(dense_adjacency(g), x)
    out_coo = spmm(coo_adjacency(g), x)
    np.testing.assert_allclose(out_dense, out_coo, rtol=1e-5, atol=1e-5)


def test_rectangular(rng):
    g = coo_to_csr(rng.integers(0, 30, 100), rng.integers(0, 50, 100),
                   rng.random(100).astype(np.float32), (30, 50))
    x = jnp.asarray(rng.standard_normal((50, 8)), dtype=jnp.float32)
    np.testing.assert_allclose(
        spmm(coo_adjacency(g), x), g.to_dense() @ np.asarray(x),
        rtol=1e-5, atol=1e-5)


def test_symmetric_flag_detected(rng):
    g = random_graph(rng, symmetric=True)
    adj = coo_adjacency(g)
    assert adj.symmetric
    assert adj.t_vals is adj.vals


def test_grad_x_matches_dense(rng):
    g = random_graph(rng, n=40, m=150)
    x0 = rng.standard_normal((40, 8)).astype(np.float32)
    cot = rng.standard_normal((40, 8)).astype(np.float32)

    def loss_coo(x):
        return jnp.vdot(spmm(coo_adjacency(g), x), cot)

    def loss_dense(x):
        return jnp.vdot(jnp.asarray(g.to_dense()) @ x, cot)

    g1 = jax.grad(loss_coo)(jnp.asarray(x0))
    g2 = jax.grad(loss_dense)(jnp.asarray(x0))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_grad_vals_sddmm(rng):
    """d loss / d vals must equal the SDDMM g_row . x_col at each nnz."""
    g = random_graph(rng, n=25, m=80)
    adj = coo_adjacency(g)
    x = jnp.asarray(rng.standard_normal((25, 4)), dtype=jnp.float32)
    cot = jnp.asarray(rng.standard_normal((25, 4)), dtype=jnp.float32)

    def loss(vals):
        a2 = jax.tree_util.tree_map(lambda v: v, adj)
        a2 = adj.__class__(rows=adj.rows, cols=adj.cols, vals=vals,
                           t_rows=adj.t_rows, t_cols=adj.t_cols,
                           t_vals=adj.t_vals, n_rows=adj.n_rows,
                           n_cols=adj.n_cols, nnz=adj.nnz,
                           symmetric=adj.symmetric)
        return jnp.vdot(spmm(a2, x), cot)

    dvals = jax.grad(loss)(adj.vals)
    expected = np.einsum(
        "ek,ek->e",
        np.asarray(cot)[np.asarray(adj.rows)],
        np.asarray(x)[np.asarray(adj.cols)],
    )
    np.testing.assert_allclose(dvals, expected, rtol=1e-4, atol=1e-5)


def test_jit_and_padding(rng):
    g = random_graph(rng, n=50, m=123)  # odd nnz exercises padding
    adj = coo_adjacency(g)
    assert adj.rows.shape[0] % 1024 == 0
    x = jnp.asarray(rng.standard_normal((50, 8)), dtype=jnp.float32)
    out = jax.jit(spmm)(adj, x)
    np.testing.assert_allclose(out, g.to_dense() @ np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_empty_rows(rng):
    g = coo_to_csr([5], [7], [2.0], (10, 10))
    x = jnp.ones((10, 3), dtype=jnp.float32)
    out = spmm(coo_adjacency(g), x)
    assert float(out[5, 0]) == 2.0
    assert float(jnp.abs(out).sum()) == 6.0


def test_auto_lowering_is_area_based(rng):
    """'auto' picks dense by materialized AREA, not max dimension: a
    tall-skinny operator (hypergraph factor shape) with a small dense
    footprint takes the MXU path even though one axis is long, while
    anything past the 8192^2-equivalent footprint falls back to coo.
    Square graphs keep the historical n <= 8192 cutoff exactly.
    """
    from gcn_tpu.ops.adjacency import CooAdj, DenseAdj, device_adjacency

    def lowered(shape):
        g = coo_to_csr([0], [0], [1.0], shape)
        return device_adjacency(g, "auto")

    assert isinstance(lowered((8192, 8192)), DenseAdj)     # at the cutoff
    assert isinstance(lowered((8193, 8193)), CooAdj)       # just past it
    assert isinstance(lowered((20000, 64)), DenseAdj)      # tall-skinny
    assert isinstance(lowered((64, 20000)), DenseAdj)      # short-wide
    assert isinstance(lowered((20000, 20000)), CooAdj)     # big square
