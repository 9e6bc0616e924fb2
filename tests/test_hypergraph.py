import numpy as np
import pytest

from gcn_tpu.data.synthetic import class_features, split_indices
from gcn_tpu.graph.hypergraph import (
    construct_H_with_KNN,
    construct_H_with_KNN_multi,
    euclidean_distances,
    generate_G_from_H,
    hyperedge_concat,
)
from gcn_tpu.models.hgnn import HGNN


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    labels = np.repeat(np.arange(4), 50)
    centroids = rng.normal(size=(4, 16)) * 3
    x = centroids[labels] + rng.normal(size=(200, 16))
    return x.astype(np.float32), labels


def test_euclidean_distances(feats):
    """True (square-rooted) Euclidean distances, as the reference's Eu_dis
    (pyhgnn/utils/hypergraph_utils.py:23 takes np.sqrt)."""
    x, _ = feats
    d = euclidean_distances(x[:20])
    ref = np.sqrt(((x[:20, None, :] - x[None, :20, :]) ** 2).sum(-1))
    assert np.allclose(d, ref, atol=1e-3)
    assert np.allclose(np.diag(d), 0.0, atol=1e-3)
    assert np.allclose(d, d.T)


def test_knn_weights_match_reference_formula(feats):
    """H[v, c] = exp(-d(v,c)^2 / (m * avg_d(c))^2) with true Euclidean d
    (hypergraph_utils.py:151), pinned by an independent naive loop."""
    x, _ = feats
    x = x[:30]
    h = construct_H_with_KNN(x, k_neig=5, m_prob=1.0)
    n = x.shape[0]
    for c in range(n):
        d = np.sqrt(((x - x[c]) ** 2).sum(-1))
        d[c] = 0.0
        avg = d.mean()
        nearest = np.argsort(d)[:5]
        if c not in nearest:
            nearest[-1] = c
        expect = np.zeros(n)
        expect[nearest] = np.exp(-(d[nearest] ** 2) / avg ** 2)
        np.testing.assert_allclose(h[:, c], expect, rtol=1e-4, atol=1e-6)


def test_vectorized_H_matches_reference_loop(feats):
    """The vectorized argpartition builder is pinned to the reference's
    per-center loop (hypergraph_utils.py:157-181, kept verbatim as
    _construct_H_with_KNN_loop) — same selected sets, same weights."""
    from gcn_tpu.graph.hypergraph import _construct_H_with_KNN_loop

    x, _ = feats
    for k, m_prob, is_prob in ((5, 1.0, True), (10, 2.0, True),
                               (7, 1.0, False)):
        fast = construct_H_with_KNN(x, k, is_prob=is_prob, m_prob=m_prob)
        slow = _construct_H_with_KNN_loop(x, k, is_prob=is_prob,
                                          m_prob=m_prob)
        np.testing.assert_array_equal(fast, slow)


def test_vectorized_H_duplicate_points():
    """>k exact-duplicate points can push a center out of its own k
    nearest; both builders must still include the center (the loop's
    neigh[-1] overwrite; the vectorized farthest-evict)."""
    from gcn_tpu.graph.hypergraph import _construct_H_with_KNN_loop

    x = np.zeros((12, 4), dtype=np.float32)  # all identical
    x[8:] = 1.0                              # plus a distinct cluster
    k = 5
    fast = construct_H_with_KNN(x, k)
    slow = _construct_H_with_KNN_loop(x, k)
    # every center is in its own hyperedge, with weight exp(0)=1 only
    # when is_prob weights are degenerate; pin membership + column degree
    for h in (fast, slow):
        assert np.all(np.diag(h) > 0)
        assert np.all((h > 0).sum(axis=0) == k)


def test_multi_scale_split(feats):
    """split_diff_scale=True returns one H per K and generate_G_from_H maps
    over the list (hypergraph_utils.py:80-93, 157-181)."""
    x, _ = feats
    hs = construct_H_with_KNN_multi([x], [5, 10], split_diff_scale=True)
    assert isinstance(hs, list) and len(hs) == 2
    assert hs[0].shape == (200, 200) and hs[1].shape == (200, 200)
    assert np.allclose(hs[0], construct_H_with_KNN(x, 5))
    gs = generate_G_from_H(hs)
    assert isinstance(gs, list) and len(gs) == 2
    g0 = generate_G_from_H(hs[0])
    assert np.allclose(gs[0].to_dense(), g0.to_dense())


def test_knn_incidence_shape_and_degree(feats):
    x, _ = feats
    h = construct_H_with_KNN(x, k_neig=5)
    assert h.shape == (200, 200)
    # each hyperedge (column) has exactly k vertices
    assert np.all((h > 0).sum(axis=0) == 5)
    # probabilistic weights in (0, 1]
    nz = h[h > 0]
    assert np.all(nz > 0) and np.all(nz <= 1.0 + 1e-6)


def test_feature_concat(feats):
    """Multi-modality feature fusion: empty-skip, >2D flatten, normal_col
    (hypergraph_utils.py:28-55)."""
    from gcn_tpu.graph.hypergraph import feature_concat

    x, _ = feats
    a = x[:50]
    b = np.stack([x[:50], x[:50] * 2], axis=1)  # (50, 2, 16) -> flattens
    out = feature_concat(a, None, a * 3)
    assert out.shape == (50, 32)
    np.testing.assert_allclose(out[:, 16:], a * 3, rtol=1e-6)
    flat = feature_concat(b)
    assert flat.shape == (100, 16)
    normed = feature_concat(a, a * 5, normal_col=True)
    assert np.abs(normed).max() <= 1.0 + 1e-6


def test_hyperedge_concat(feats):
    x, _ = feats
    h1 = construct_H_with_KNN(x, 5)
    h2 = construct_H_with_KNN(x, 10)
    h = hyperedge_concat(h1, None, h2)
    assert h.shape == (200, 400)
    multi = construct_H_with_KNN_multi([x], [5, 10])
    assert np.allclose(h, multi)


def test_generate_G_properties(feats):
    x, _ = feats
    h = construct_H_with_KNN(x, 5)
    g = generate_G_from_H(h)
    dense = g.to_dense()
    assert dense.shape == (200, 200)
    assert np.allclose(dense, dense.T, atol=1e-5)  # symmetric
    # matches the explicit formula
    w = np.ones(200)
    dv = h.sum(1)
    de = h.sum(0)
    ref = (np.diag(dv ** -0.5) @ h @ np.diag(w) @ np.diag(1 / de)
           @ h.T @ np.diag(dv ** -0.5))
    assert np.allclose(dense, ref, atol=1e-4)


def test_hgnn_trains(feats):
    x, labels = feats
    h = construct_H_with_KNN(x, 8)
    g = generate_G_from_H(h)
    idx_train, idx_val, idx_test = split_indices(labels, per_class_train=10,
                                                 n_val=40, n_test=100)
    model = HGNN(in_ch=16, n_class=4, n_hid=32, seed=0)
    model.fit(x, g, labels, idx_train, idx_val, num_epochs=120)
    acc = model.test(idx_test, verbose=False)
    assert acc > 0.8, f"HGNN accuracy too low: {acc}"


def test_hgnn_gx_expansion_identical(rng):
    """G(XW + 1b^T) == (GX)W + (G1)b^T — the layer-1 hoist expansion."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.graph.csr import CSRGraph
    from gcn_tpu.models.hgnn import hgnn_forward, init_hgnn_params
    from gcn_tpu.ops.adjacency import dense_adjacency
    from gcn_tpu.ops.spmm import spmm

    n, f = 40, 12
    dense = rng.random((n, n)).astype(np.float32) * (rng.random((n, n)) < 0.2)
    adj = dense_adjacency(CSRGraph.from_dense(dense))
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    params = init_hgnn_params(jax.random.PRNGKey(0), f, 8, 4)
    plain = hgnn_forward(params, x, adj, train=False)
    gx = spmm(adj, x)
    rs = spmm(adj, jnp.ones((n, 1), jnp.float32))[:, 0]
    hoisted = hgnn_forward(params, None, adj, train=False, gx=gx,
                           g_rowsum=rs)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(hoisted),
                               rtol=1e-5, atol=1e-5)


def test_two_hop_factors_match_dense_G(rng):
    import jax.numpy as jnp

    from gcn_tpu.graph.hypergraph import (construct_H_with_KNN,
                                          generate_G_factors,
                                          generate_G_from_H)
    from gcn_tpu.ops.adjacency import device_adjacency
    from gcn_tpu.ops.spmm import TwoHopAdj, spmm

    feats = rng.standard_normal((60, 10)).astype(np.float32)
    h = construct_H_with_KNN(feats, k_neig=6)
    g_dense = generate_G_from_H(h)
    a1, a2 = generate_G_factors(h)
    two_hop = TwoHopAdj(device_adjacency(a1, "dense"),
                        device_adjacency(a2, "dense"))
    x = jnp.asarray(rng.standard_normal((60, 8)).astype(np.float32))
    out_dense = np.asarray(spmm(device_adjacency(g_dense, "dense"), x))
    out_factored = np.asarray(spmm(two_hop, x))
    np.testing.assert_allclose(out_factored, out_dense, rtol=1e-4,
                               atol=1e-5)


def test_hgnn_resume_matches_uninterrupted(feats, tmp_path):
    """HGNN fit(30) + save_state + resume fit(30) == fit(60), including
    the MultiStepLR schedule position carried in the optax state."""
    x, labels = feats
    h = construct_H_with_KNN(x, 8)
    g = generate_G_from_H(h)
    idx = np.arange(160)
    kw = dict(in_ch=16, n_class=4, n_hid=16, dropout=0.0, seed=0,
              milestones=(20,))

    ref = HGNN(**kw)
    ref.fit(x, g, labels, idx, num_epochs=60)

    m = HGNN(**kw)
    m.fit(x, g, labels, idx, num_epochs=30)
    path = str(tmp_path / "hgnn_state")
    m.save_state(path)
    m2 = HGNN(**kw)
    m2.fit(x, g, labels, idx, num_epochs=30, resume_from=path)
    assert m2._epochs_done == 60
    np.testing.assert_allclose(np.asarray(m2.output),
                               np.asarray(ref.output), rtol=2e-4,
                               atol=2e-4)


def test_hgnn_trains_with_factored_G(rng):
    from gcn_tpu.graph.hypergraph import (construct_H_with_KNN,
                                          generate_G_factors)
    from gcn_tpu.models.hgnn import HGNN

    n, f, c = 120, 12, 4
    labels = rng.integers(0, c, n)
    centroids = rng.standard_normal((c, f)).astype(np.float32)
    feats = (centroids[labels]
             + 0.3 * rng.standard_normal((n, f)).astype(np.float32))
    h = construct_H_with_KNN(feats, k_neig=6)
    factors = generate_G_factors(h)
    idx = rng.permutation(n)
    model = HGNN(in_ch=f, n_class=c, n_hid=16, dropout=0.0)
    model.fit(feats, factors, labels, idx[:80], idx_val=idx[80:],
              num_epochs=60)
    assert model.test(idx[80:], verbose=False) > 0.8
