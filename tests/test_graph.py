import numpy as np
import pytest

from gcn_tpu.graph.csr import CSRGraph, coo_to_csr
from gcn_tpu.graph.normalize import gcn_normalize, row_normalize, \
    row_normalize_features


def random_graph(rng, n=50, m=200, weighted=False):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    vals = rng.random(m).astype(np.float32) if weighted else None
    return coo_to_csr(src, dst, vals, (n, n))


def test_coo_csr_roundtrip(rng):
    g = random_graph(rng)
    g.validate()
    r, c, v = g.to_coo()
    g2 = coo_to_csr(r, c, v, g.shape, sum_duplicates=False)
    assert np.array_equal(g.indptr, g2.indptr)
    assert np.array_equal(g.indices, g2.indices)
    assert np.allclose(g.data, g2.data)


def test_duplicate_summing():
    g = coo_to_csr([0, 0, 1], [1, 1, 0], [1.0, 2.0, 5.0], (2, 2))
    assert g.nnz == 2
    assert g.to_dense()[0, 1] == 3.0


def test_columns_sorted(rng):
    g = random_graph(rng)
    for i in range(g.shape[0]):
        row = g.indices[g.indptr[i]:g.indptr[i + 1]]
        assert np.all(np.diff(row) > 0)


def test_dense_roundtrip(rng):
    d = (rng.random((20, 20)) < 0.2).astype(np.float32)
    g = CSRGraph.from_dense(d)
    assert np.allclose(g.to_dense(), d)


def test_symmetrize(rng):
    g = random_graph(rng, weighted=True)
    s = g.symmetrize()
    assert s.is_symmetric()
    dense = s.to_dense()
    assert np.all(np.diag(dense) == 0)
    assert set(np.unique(dense)) <= {0.0, 1.0}


def test_transpose(rng):
    g = random_graph(rng, weighted=True)
    assert np.allclose(g.transpose().to_dense(), g.to_dense().T)


def test_permute_matches_dense(rng):
    g = random_graph(rng, n=30, m=120, weighted=True)
    perm = rng.permutation(30)
    gp = g.permute(perm)
    dense = g.to_dense()
    assert np.allclose(gp.to_dense(), dense[np.ix_(perm, perm)])


def test_permute_rows(rng):
    g = random_graph(rng, n=30, m=120, weighted=True)
    perm = rng.permutation(30)
    gp = g.permute_rows(perm)
    assert np.allclose(gp.to_dense(), g.to_dense()[perm])


def test_isomorphism_checksum_invariance(rng):
    g = random_graph(rng, n=40, m=160, weighted=True)
    perm = rng.permutation(40)
    a = np.sort(g.isomorphism_checksum())
    b = np.sort(g.permute(perm).isomorphism_checksum())
    assert np.allclose(a, b)
    # and a modified graph is detected
    g2 = g.copy()
    g2.data[0] += 1.0
    c = np.sort(g2.isomorphism_checksum())
    assert not np.allclose(a, c)


def test_gcn_normalize_matches_scipy_formula(rng):
    g = random_graph(rng, n=25, m=100).symmetrize()
    norm = gcn_normalize(g)
    a = g.to_dense() + np.eye(25)
    d = a.sum(1)
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    expected = dinv[:, None] * a * dinv[None, :]
    assert np.allclose(norm.to_dense(), expected, atol=1e-6)


def test_gcn_normalize_skips_self_loop_when_diag_present():
    # mirror of the reference rule mx[0,0] == 0 (utils.py:81)
    g = coo_to_csr([0, 0, 1], [0, 1, 0], [1.0, 1.0, 1.0], (2, 2))
    norm = gcn_normalize(g)
    a = g.to_dense()  # no +I because A[0,0] != 0
    d = a.sum(1)
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    assert np.allclose(norm.to_dense(), dinv[:, None] * a * dinv[None, :],
                       atol=1e-6)


def test_row_normalize(rng):
    g = random_graph(rng, n=25, m=100).symmetrize()
    norm = row_normalize(g)
    sums = norm.to_dense().sum(1)
    assert np.allclose(sums[sums > 0], 1.0, atol=1e-5)


def test_row_normalize_features():
    x = np.array([[1, 3], [0, 0], [2, 2]], dtype=np.float32)
    out = row_normalize_features(x)
    assert np.allclose(out, [[0.25, 0.75], [0, 0], [0.5, 0.5]])


def test_isolated_vertices_ok():
    g = coo_to_csr([0], [1], [1.0], (5, 5)).symmetrize()
    norm = gcn_normalize(g)
    norm.validate()
    assert np.isfinite(norm.data).all()


def test_with_self_loops_csr_native(rng):
    """CSR-native self-loop insertion (no COO rebuild): mixed present /
    missing diagonal entries, sorted columns preserved, values bumped."""
    from gcn_tpu.graph.csr import coo_to_csr

    n = 64
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    # force some diagonal entries
    src[:10] = dst[:10] = np.arange(10)
    g = coo_to_csr(src, dst, rng.random(400).astype(np.float32), (n, n))
    out = g.with_self_loops(0.5)
    want = g.to_dense() + 0.5 * np.eye(n, dtype=np.float32)
    np.testing.assert_allclose(out.to_dense(), want, rtol=1e-6)
    # columns stay sorted within each row
    for i in range(n):
        row = out.indices[out.indptr[i]:out.indptr[i + 1]]
        assert (np.diff(row) > 0).all()


def test_permute_native_matches_numpy(rng):
    """Native csr_permute must equal the numpy COO-lexsort fallback."""
    from gcn_tpu.graph.csr import coo_to_csr
    from gcn_tpu.reorder import native

    if not native.available():
        import pytest

        pytest.skip("native reorder lib unavailable")
    n = 200
    src = rng.integers(0, n, 1500)
    dst = rng.integers(0, n, 1500)
    g = coo_to_csr(src, dst, rng.random(1500).astype(np.float32), (n, n))
    perm = rng.permutation(n).astype(np.int32)
    got = native.csr_permute(g, perm)
    # numpy reference (the in-method fallback path)
    p = perm.astype(np.int64)
    inv = np.empty_like(p)
    inv[p] = np.arange(n)
    r, c, v = g.to_coo()
    want = coo_to_csr(inv[r], inv[c], v, (n, n), sum_duplicates=False)
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data)


def test_to_dag(rng):
    """Edgelist::to_dag parity (edgelist.cu:37-47): every edge oriented
    low->high; dense equality with triu(A + A^T) + kept diagonal."""
    g = random_graph(rng, weighted=True)
    dag = g.to_dag()
    r, c, _ = dag.to_coo()
    assert np.all(r <= c)
    d = g.to_dense()
    want = np.triu(d + d.T, k=1) + np.diag(np.diag(d))
    np.testing.assert_allclose(dag.to_dense(), want, rtol=1e-6)
