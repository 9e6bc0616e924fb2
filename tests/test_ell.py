"""EllAdj format + Pallas ELL SpMM: tiler invariants, numerics, grads.

Mirrors the reference's built-in tiler/kernel self-checks (tile.cu,
renumber.cu:123-149) plus the numerical-parity strategy SURVEY.md §4 calls
for. Runs on CPU via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.graph.csr import CSRGraph, coo_to_csr
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.ops.ell_spmm import spmm_ell
from gcn_tpu.ops.spmm import spmm
from gcn_tpu.tile.ell import EllAdj, degree_sort_order, ell_adjacency


def random_graph(rng, n=120, m=900, symmetric=False):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    vals = rng.random(m).astype(np.float32)
    g = coo_to_csr(src, dst, vals, (n, n))
    if symmetric:
        g = gcn_normalize(g.symmetrize())
    return g


def test_tiler_conserves_nnz_and_values(rng):
    g = random_graph(rng)
    adj = ell_adjacency(g, r=16, k_pad=32)
    # every (row, col, val) appears exactly once in the slot arrays
    cols = np.asarray(adj.cols)
    vals = np.asarray(adj.vals)
    win = np.asarray(adj.win)
    # reconstruct rows per slot: block b covers window win[b], row = w*r + slot_r
    nb, p, r = cols.shape
    rows = (win[:, None, None] * r
            + np.broadcast_to(np.arange(r), (nb, p, r))).reshape(-1)
    mask = vals.reshape(-1) != 0
    rec = sorted(zip(rows[mask],
                     cols.reshape(-1)[mask],
                     vals.reshape(-1)[mask]))
    rows_ref = np.repeat(np.arange(g.shape[0]), np.diff(g.indptr))
    ref_mask = g.data != 0
    ref = sorted(zip(rows_ref[ref_mask], g.indices[ref_mask],
                     g.data[ref_mask]))
    assert len(rec) == len(ref)
    for (a, b, c), (d, e, f) in zip(rec, ref):
        assert a == d and b == e and c == f


def test_validate_passes_and_catches_corruption(rng):
    """EllAdj.validate() (the safety_check analogue) accepts every
    well-formed adjacency and rejects a corrupted one."""
    import dataclasses

    for symmetric in (True, False):
        g = random_graph(rng, n=90, m=600, symmetric=symmetric)
        ell_adjacency(g, r=8, k_pad=32).validate()
    g = random_graph(rng, n=90, m=600, symmetric=True)
    adj = ell_adjacency(g, r=8, k_pad=32)
    bad_win = np.asarray(adj.win).copy()
    if len(bad_win) > 1:
        bad_win[-1] = 0  # breaks nondecreasing
        bad = dataclasses.replace(adj, win=jnp.asarray(bad_win))
        with pytest.raises(AssertionError):
            bad.validate()


def test_every_window_visited(rng):
    g = random_graph(rng, n=100, m=50)  # sparse: some windows empty
    adj = ell_adjacency(g, r=8, k_pad=32)
    win = np.asarray(adj.win)
    assert (np.diff(win) >= 0).all(), "win must be nondecreasing"
    assert set(win) == set(range(adj.num_windows))


@pytest.mark.parametrize("k,k_pad,r", [
    (32, 32, 16), (4, 32, 16), (16, 16, 8), (48, 32, 16), (64, 64, 8),
])
def test_matches_dense_f64(rng, k, k_pad, r):
    g = random_graph(rng, symmetric=True)
    g = g.permute(degree_sort_order(g))
    adj = ell_adjacency(g, r=r, k_pad=k_pad)
    x = rng.standard_normal((g.shape[1], k)).astype(np.float32)
    out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
    ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_nonsymmetric_transpose_grad(rng):
    g = random_graph(rng, n=64, m=400, symmetric=False)
    adj = ell_adjacency(g, r=8, k_pad=32)
    assert not adj.symmetric
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmm_ell(adj, xx), x)
    dx = np.asarray(vjp(ct)[0])
    ref = g.to_dense().astype(np.float64).T @ np.asarray(ct, np.float64)
    np.testing.assert_allclose(dx, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [8, 32])
def test_sddmm_vals_cotangent_matches_coo(rng, k):
    """d loss / d vals via the ELL layout == the coo SDDMM
    (dval[e] = <g[row_e], x[col_e]>, ops/spmm.py) at every stored edge."""
    from gcn_tpu.ops.adjacency import device_adjacency

    g = random_graph(rng, n=96, m=600, symmetric=True)
    g = g.permute(degree_sort_order(g))
    adj = ell_adjacency(g, r=8, k_pad=32)
    coo = device_adjacency(g, "coo")
    x = jnp.asarray(rng.standard_normal((96, k)).astype(np.float32))

    d_ell = jax.grad(lambda a: jnp.sum(spmm_ell(a, x) ** 2),
                     allow_int=True)(adj)
    d_coo = jax.grad(lambda a: jnp.sum(spmm(a, x) ** 2),
                     allow_int=True)(coo)

    # scatter the ELL cotangent back to dense (row, col) for comparison
    cols = np.asarray(adj.cols)
    dv = np.asarray(d_ell.vals, dtype=np.float64)
    vals = np.asarray(adj.vals)
    win = np.asarray(adj.win)
    r = adj.r
    dense_ref = np.zeros(g.shape, dtype=np.float64)
    for b in range(cols.shape[0]):
        for j in range(cols.shape[1]):
            for i in range(r):
                if vals[b, j, i] != 0:
                    dense_ref[win[b] * r + i, cols[b, j, i]] += dv[b, j, i]
    want = np.zeros(g.shape, dtype=np.float64)
    # CooAdj pads edges to E_pad; stored edges are the first nnz entries.
    np.add.at(want,
              (np.asarray(coo.rows)[:g.nnz], np.asarray(coo.cols)[:g.nnz]),
              np.asarray(d_coo.vals, np.float64)[:g.nnz])
    np.testing.assert_allclose(dense_ref, want, rtol=1e-4, atol=1e-4)


def test_grad_through_loss(rng):
    g = random_graph(rng, symmetric=True)
    g = g.permute(degree_sort_order(g))
    adj = ell_adjacency(g, r=16, k_pad=32)
    x = jnp.asarray(rng.standard_normal((g.shape[0], 8)).astype(np.float32))
    got = jax.grad(lambda xx: jnp.sum(spmm_ell(adj, xx) ** 2))(x)
    dense = jnp.asarray(g.to_dense())
    want = jax.grad(lambda xx: jnp.sum((dense @ xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_spmm_dispatcher_routes_ell(rng):
    g = random_graph(rng, symmetric=True)
    adj = ell_adjacency(g, r=16)
    x = jnp.asarray(rng.standard_normal((g.shape[0], 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(adj, x)), np.asarray(spmm_ell(adj, x)))


def test_degree_sort_is_permutation_and_descending(rng):
    g = random_graph(rng)
    perm = degree_sort_order(g)
    assert sorted(perm) == list(range(g.shape[0]))
    deg = np.diff(g.indptr)
    assert (np.diff(deg[perm]) <= 0).all()


def test_jit_and_vmap_compatible_pytree(rng):
    g = random_graph(rng, symmetric=True)
    adj = ell_adjacency(g, r=16)
    leaves, treedef = jax.tree_util.tree_flatten(adj)
    adj2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(adj2, EllAdj)
    x = jnp.asarray(rng.standard_normal((g.shape[0], 8)).astype(np.float32))
    out = jax.jit(spmm_ell)(adj, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(spmm_ell(adj, x)),
                               rtol=1e-5, atol=1e-6)


def test_native_tiler_matches_numpy(rng):
    from gcn_tpu.tile import native
    from gcn_tpu.tile.ell import _ell_arrays

    if not native.available():
        pytest.skip("native tiler not built")
    g = random_graph(rng, n=150, m=1200, symmetric=True)
    g = g.permute(degree_sort_order(g))
    for r, p in [(8, 4), (16, 2), (32, 1)]:
        ref = _ell_arrays(g.indptr, g.indices, g.data, g.shape[0], r, p)[:3]
        nat = native.ell_arrays(g.indptr, g.indices, g.data, g.shape[0], r, p)
        for a, b in zip(ref, nat):
            np.testing.assert_array_equal(a, b)


def test_native_tiler_used_by_default(rng):
    from gcn_tpu.tile import native

    if not native.available():
        pytest.skip("native tiler not built")
    g = random_graph(rng, symmetric=True)
    a1 = ell_adjacency(g, r=16, prefer_native=True)
    a2 = ell_adjacency(g, r=16, prefer_native=False)
    np.testing.assert_array_equal(np.asarray(a1.cols), np.asarray(a2.cols))
    np.testing.assert_array_equal(np.asarray(a1.vals), np.asarray(a2.vals))
    np.testing.assert_array_equal(np.asarray(a1.win), np.asarray(a2.win))


def test_packed_gather_path_matches(rng, monkeypatch):
    """Force every packed-table q (budget -> q picks the max) and check
    numerics; also check the q ladder itself."""
    import gcn_tpu.ops.ell_spmm as es

    monkeypatch.setattr(es, "_TABLE_BUDGET_BYTES", 1)  # forces q = qmax
    g = random_graph(rng, n=130, m=900, symmetric=True)
    g = g.permute(degree_sort_order(g))
    for k_pad, k in [(32, 32), (64, 48), (32, 8)]:
        adj = ell_adjacency(g, r=16, k_pad=k_pad)
        x = rng.standard_normal((130, k)).astype(np.float32)
        out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
        ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # intermediate q (2): budget that fits n/2 rows but not n
    import jax.numpy as jnp2

    budget = 80 * 128 * 4
    monkeypatch.setattr(es, "_TABLE_BUDGET_BYTES", budget)
    assert es._pack_q(130, 32, jnp2.float32) == 2
    assert es._pack_q(130, 32, jnp2.bfloat16) == 1  # bf16 halves footprint
    adj = ell_adjacency(g, r=16, k_pad=32)
    x = rng.standard_normal((130, 16)).astype(np.float32)
    out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
    ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_row_chunked_spmm_matches(rng):
    """Tiny chunk budget forces multiple row chunks; numerics unchanged."""
    g = random_graph(rng, n=200, m=1600, symmetric=True)
    g = g.permute(degree_sort_order(g))
    whole = ell_adjacency(g, r=16, k_pad=32)
    chunked = ell_adjacency(g, r=16, k_pad=32, chunk_slots=1024)
    assert len(chunked.chunks) > 1
    # chunks partition the block range at window boundaries
    assert chunked.chunks[0][0] == 0 and chunked.chunks[-1][1] == \
        chunked.num_blocks
    for (a, b) in zip(chunked.chunks[:-1], chunked.chunks[1:]):
        assert a[1] == b[0] and a[3] == b[2]
    x = jnp.asarray(rng.standard_normal((200, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm_ell(chunked, x)),
                               np.asarray(spmm_ell(whole, x)),
                               rtol=1e-6, atol=1e-6)
    # grads too
    g1 = jax.grad(lambda xx: jnp.sum(spmm_ell(chunked, xx) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(spmm_ell(whole, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_empty_graph(rng):
    g = CSRGraph(indptr=np.zeros(33, np.int32), indices=np.zeros(0, np.int32),
                 data=np.zeros(0, np.float32), shape=(32, 32))
    adj = ell_adjacency(g, r=8, k_pad=32)
    x = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    out = np.asarray(spmm_ell(adj, x))
    np.testing.assert_array_equal(out, np.zeros((32, 8), np.float32))


def test_products_bf16_close(rng):
    g = random_graph(rng, symmetric=True)
    g = g.permute(degree_sort_order(g))
    exact = ell_adjacency(g, r=16)
    fast = ell_adjacency(g, r=16, products_bf16=True)
    x = jnp.asarray(rng.standard_normal((g.shape[0], 16)).astype(np.float32))
    a = np.asarray(spmm_ell(exact, x))
    b = np.asarray(spmm_ell(fast, x))
    np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-2)
    assert np.abs(b - a).max() > 0  # really took the bf16 path


def test_table_bf16_close(rng):
    """table_bf16 rounds only the gather table: result within one bf16
    rounding of exact, forward and backward."""
    g = random_graph(rng, n=100, m=700, symmetric=True)
    g = g.permute(degree_sort_order(g))
    exact = ell_adjacency(g, r=8, k_pad=32)
    approx = ell_adjacency(g, r=8, k_pad=32, table_bf16=True)
    x = jnp.asarray(rng.standard_normal((100, 16)).astype(np.float32))
    want = np.asarray(spmm_ell(exact, x))
    got = np.asarray(spmm_ell(approx, x))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    gw = jax.grad(lambda xx: jnp.sum(spmm_ell(exact, xx) ** 2))(x)
    ga = jax.grad(lambda xx: jnp.sum(spmm_ell(approx, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gw), rtol=5e-2,
                               atol=5e-2)


def test_span_guard_on_unsorted_graph(rng):
    """Non-degree-sorted graphs fragment into many equal-pass runs; the
    tiler must drop spans (fall back to the Pallas reduce) rather than
    emit an unbounded-segment program. Degree-sorted keeps them."""
    # heavy-tailed degrees in random row order -> many span runs
    n = 2000
    deg = np.minimum((rng.pareto(1.0, n) * 6 + 1).astype(np.int64), 200)
    src = np.repeat(np.arange(n), deg)
    dst = rng.integers(0, n, src.shape[0])
    g = coo_to_csr(src, dst, np.ones(src.shape[0], np.float32),
                   (n, n)).symmetrize()
    unsorted_adj = ell_adjacency(g, r=8, k_pad=32)
    sorted_g = g.permute(degree_sort_order(g))
    sorted_adj = ell_adjacency(sorted_g, r=8, k_pad=32)
    assert sorted_adj.spans, "sorted graph should keep the grouped reduce"
    assert unsorted_adj.spans == ()
    # and the fallback still computes correctly
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    got = np.asarray(spmm_ell(unsorted_adj, x))
    want = g.to_dense().astype(np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(got, want[:, :8], rtol=1e-4, atol=1e-4)


def test_serving_span_limit_matches_default(rng):
    """span_pass_limit=0 (unlimited, the serving config) is numerically
    identical to the training default."""
    g = random_graph(rng, n=140, m=1000, symmetric=True)
    g = g.permute(degree_sort_order(g))
    a_default = ell_adjacency(g, r=8, k_pad=32)
    a_serving = ell_adjacency(g, r=8, k_pad=32, span_pass_limit=0)
    assert a_serving.span_pass_limit > 10**6
    x = jnp.asarray(rng.standard_normal((140, 8)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(spmm_ell(a_default, x)),
                                  np.asarray(spmm_ell(a_serving, x)))


def test_grouped_matches_pallas_reduce(rng):
    """The grouped-XLA reduce (spans) and the Pallas revisit reduce are
    numerically identical (both exact f32)."""
    import dataclasses

    g = random_graph(rng, n=150, m=1100, symmetric=True)
    g = g.permute(degree_sort_order(g))
    adj = ell_adjacency(g, r=8, k_pad=32)
    assert adj.spans  # grouped path is the default
    pallas_adj = dataclasses.replace(adj, spans=(), t_spans=())
    x = jnp.asarray(rng.standard_normal((150, 8)).astype(np.float32))
    a = np.asarray(spmm_ell(adj, x))
    b = np.asarray(spmm_ell(pallas_adj, x))
    np.testing.assert_array_equal(a, b)


def test_hub_pallas_region(rng):
    """Hub windows (pass count > span_pass_limit) take the merged Pallas
    revisit region inside the span path; result stays exact vs dense f64,
    forward and backward."""
    n = 96
    # two hub rows (degree ~ 3*threshold*p) + a normal tail
    src = np.concatenate([
        np.zeros(200, np.int64), np.ones(180, np.int64),
        rng.integers(2, n, 500),
    ])
    dst = np.concatenate([
        rng.permutation(n)[:90].repeat(3)[:200],
        rng.integers(0, n, 180),
        rng.integers(0, n, 500),
    ])
    g = coo_to_csr(src, dst, rng.random(880).astype(np.float32),
                   (n, n)).symmetrize(binarize=False)
    g = g.permute(degree_sort_order(g))
    # hub_split=False: this test pins the MERGED-PALLAS hub path, which
    # still serves stacked per-shard adjacencies (build_sharded_ell) and
    # non-prefix-hub graphs
    adj = ell_adjacency(g, r=8, k_pad=32, hub_split=False)
    assert any(pw > adj.span_pass_limit for _, _, pw, _, _ in adj.spans), \
        "fixture must create at least one hub span"

    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    got = np.asarray(spmm_ell(adj, x))
    want = g.to_dense().astype(np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(got, want[:, :8], rtol=1e-5, atol=1e-5)
    # backward too
    gx = jax.grad(lambda xx: jnp.sum(spmm_ell(adj, xx) ** 2))(x)
    dense = jnp.asarray(g.to_dense())
    wx = jax.grad(lambda xx: jnp.sum((dense @ xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=1e-4,
                               atol=1e-4)


def test_rectangular_matrix(rng):
    """EllAdj on non-square matrices (hypergraph incidence shape)."""
    n, m = 96, 40
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, m, 500)
    vals = rng.random(500).astype(np.float32)
    g = coo_to_csr(src, dst, vals, (n, m))
    adj = ell_adjacency(g, r=16, k_pad=32)
    assert not adj.symmetric
    x = rng.standard_normal((m, 8)).astype(np.float32)
    out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
    ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # transpose direction via vjp: (n,k) cotangent -> (m,k)
    ct = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmm_ell(adj, xx), jnp.asarray(x))
    dx = np.asarray(vjp(ct)[0])
    ref_t = g.to_dense().astype(np.float64).T @ np.asarray(ct, np.float64)
    np.testing.assert_allclose(dx, ref_t, rtol=1e-5, atol=1e-5)


def test_hub_split_matches_dense(rng):
    """Hub-row splitting (the round-3 training default): rows above
    span_pass_limit*P slots are refined into virtual chunks + prefix
    epilogue; forward/backward must stay exact vs dense f64 and the
    adjacency must report the split."""
    n = 96
    src = np.concatenate([
        np.zeros(200, np.int64), np.ones(180, np.int64),
        rng.integers(2, n, 500),
    ])
    dst = np.concatenate([
        rng.permutation(n)[:90].repeat(3)[:200],
        rng.integers(0, n, 180),
        rng.integers(0, n, 500),
    ])
    g = coo_to_csr(src, dst, rng.random(880).astype(np.float32),
                   (n, n)).symmetrize(binarize=False)
    g = g.permute(degree_sort_order(g))
    adj = ell_adjacency(g, r=8, k_pad=32)  # hub_split defaults on
    assert adj.n_hub > 0 and adj.n_virt > n, "fixture must split rows"
    assert all(pw <= adj.span_pass_limit for _, _, pw, _, _ in adj.spans)
    adj.validate()

    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    got = np.asarray(spmm_ell(adj, x))
    want = g.to_dense().astype(np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(got, want[:, :8], rtol=1e-5, atol=1e-5)
    gx = jax.grad(lambda xx: jnp.sum(spmm_ell(adj, xx) ** 2))(x)
    dense = jnp.asarray(g.to_dense())
    wx = jax.grad(lambda xx: jnp.sum((dense @ xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=1e-4,
                               atol=1e-4)
    # edge-weight cotangent parity vs the no-split layout
    adj_n = ell_adjacency(g, r=8, k_pad=32, hub_split=False)
    _, vjp_s = jax.vjp(lambda a: spmm_ell(a, x), adj)
    _, vjp_n = jax.vjp(lambda a: spmm_ell(a, x), adj_n)
    ct = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    dv_s = vjp_s(ct)[0].vals
    dv_n = vjp_n(ct)[0].vals
    np.testing.assert_allclose(float(jnp.sum(dv_s)), float(jnp.sum(dv_n)),
                               rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(dv_s))),
                               float(jnp.sum(jnp.abs(dv_n))), rtol=1e-4)


def test_hub_split_asymmetric_transpose(rng):
    """Asymmetric matrix where forward rows split but the transpose's
    hub rows are not a sorted prefix (no t-split): vjp must still match
    dense."""
    n, m = 96, 256
    src = np.concatenate([np.zeros(300, np.int64),
                          rng.integers(1, n, 400)])
    dst = np.concatenate([rng.integers(0, m, 300),
                          rng.integers(0, m, 400)])
    # row 0 is the lone hub (deg ~300 > cap) and already a prefix;
    # rectangular matrices cannot .permute()
    g = coo_to_csr(src, dst, rng.random(700).astype(np.float32), (n, m))
    adj = ell_adjacency(g, r=8, k_pad=32)
    assert adj.n_hub > 0
    adj.validate()
    x = jnp.asarray(rng.standard_normal((m, 8)).astype(np.float32))
    out = np.asarray(spmm_ell(adj, x))
    ref = g.to_dense().astype(np.float64) @ np.asarray(x, np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmm_ell(adj, xx), x)
    dx = np.asarray(vjp(ct)[0])
    ref_t = g.to_dense().astype(np.float64).T @ np.asarray(ct, np.float64)
    np.testing.assert_allclose(dx, ref_t, rtol=1e-5, atol=1e-5)


def test_freq_split_matches_single_table(rng):
    """Frequency-split (hot prefix + cold tail) SpMM == single-table
    SpMM, forward and backward."""
    from gcn_tpu.tile import ell_adjacency_freq, spmm_ell_freq

    n = 384
    src = np.concatenate([rng.integers(0, 40, 1200),   # hot columns
                          rng.integers(0, n, 800)])
    dst = np.concatenate([rng.integers(0, n, 1200),
                          rng.integers(0, n, 800)])
    g = coo_to_csr(dst, src, rng.random(2000).astype(np.float32),
                   (n, n)).symmetrize(binarize=False)
    g = g.permute(degree_sort_order(g))
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    adj = ell_adjacency(g, r=16, k_pad=32, symmetric=True)
    fs = ell_adjacency_freq(g, hot_rows=64, r=16, k_pad=32)
    fs.validate()
    assert 0.0 < fs.hot_edge_fraction < 1.0
    out = np.asarray(spmm_ell_freq(fs, x))
    ref = np.asarray(spmm_ell(adj, x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    gx_s = jax.grad(lambda xx: jnp.sum(spmm_ell_freq(fs, xx) ** 2))(x)
    gx_r = jax.grad(lambda xx: jnp.sum(spmm_ell(adj, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)


def test_freq_split_part_order(rng):
    """Within-segment cold-degree order (freq_split_order): a valid
    symmetric permutation that keeps the hot SET as the prefix, never
    increases padded slots, and leaves the SpMM a pure relabeling."""
    from gcn_tpu.tile import ell_adjacency_freq, spmm_ell_freq
    from gcn_tpu.tile.freq_split import freq_split_order

    n, h = 384, 64
    src = np.concatenate([rng.integers(0, 40, 1200),
                          rng.integers(0, n, 800)])
    dst = np.concatenate([rng.integers(0, n, 1200),
                          rng.integers(0, n, 800)])
    g = coo_to_csr(dst, src, rng.random(2000).astype(np.float32),
                   (n, n)).symmetrize(binarize=False)
    g = g.permute(degree_sort_order(g))
    po = freq_split_order(g, hot_rows=h)
    assert po is not None
    # segment-preserving permutation: hot set stays the prefix
    assert set(po[:h].tolist()) == set(range(h))
    assert np.array_equal(np.sort(po), np.arange(n))

    fs0 = ell_adjacency_freq(g, hot_rows=h, r=16, k_pad=32)
    g2 = g.permute(po)
    fs2 = ell_adjacency_freq(g2, hot_rows=h, r=16, k_pad=32)
    fs2.validate()
    # the cold (expensive) table's padding is what the order minimizes;
    # weight parts by the measured per-slot costs like the sweep does
    cost0 = 3.68 * fs0.hot.cols.size + 7.24 * fs0.cold.cols.size
    cost2 = 3.68 * fs2.hot.cols.size + 7.24 * fs2.cold.cols.size
    assert fs2.cold.cols.size <= fs0.cold.cols.size
    assert cost2 <= cost0 * (1 + 1e-9), "part order raised the paper cost"

    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    out0 = np.asarray(spmm_ell_freq(fs0, x))
    out2 = np.asarray(spmm_ell_freq(fs2, jnp.asarray(np.asarray(x)[po])))
    np.testing.assert_allclose(out2, out0[po], rtol=1e-5, atol=1e-6)

    # no split -> no order
    assert freq_split_order(g, hot_rows=n) is None


def test_freq_split_empty_cold_part(rng):
    """hot_rows covering every column (what default_hot_rows returns for
    any graph under the residency budget — including n NOT a multiple of
    8) must degrade to single-table behavior, not crash on an empty cold
    CSR or build a spurious few-column cold part."""
    from gcn_tpu.tile import ell_adjacency_freq, spmm_ell_freq
    from gcn_tpu.tile.freq_split import default_hot_rows

    for n in (64, 61):   # aligned and unaligned under-budget heights
        assert default_hot_rows(n) == n
        src = rng.integers(0, n, 400)
        dst = rng.integers(0, n, 400)
        g = coo_to_csr(dst, src, rng.random(400).astype(np.float32),
                       (n, n)).symmetrize(binarize=False)
        g = g.permute(degree_sort_order(g))
        x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

        for hot in (n, 10 * n, None):   # explicit == m, clamped, default
            fs = ell_adjacency_freq(g, hot_rows=hot, r=16, k_pad=32)
            fs.validate()
            assert fs.cold is None and fs.hot_rows == n
            out = np.asarray(spmm_ell_freq(fs, x))
            ref = np.asarray(spmm_ell(ell_adjacency(g, r=16, k_pad=32,
                                                    symmetric=True), x))
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_freq_split_wrong_kind_raises(rng):
    """device_adjacency rejects freq_split for non-ell kinds instead of
    silently dropping it (dense) or raising an opaque TypeError (coo)."""
    import pytest as _pytest

    from gcn_tpu.ops.adjacency import device_adjacency

    g = coo_to_csr(rng.integers(0, 32, 100), rng.integers(0, 32, 100),
                   rng.random(100).astype(np.float32), (32, 32))
    for kind in ("dense", "coo", "auto"):
        with _pytest.raises(ValueError, match="freq_split requires"):
            device_adjacency(g, kind, freq_split=True)


def _ladder_graph(rng, n_win=60, r=8):
    """Degree-sorted graph whose windows have n_win distinct max degrees
    (> _MAX_REDUCE_SEGMENTS at P=1), exercising the pass ladder."""
    degs = np.repeat(np.arange(n_win, 0, -1), r)  # nonincreasing
    n = len(degs)
    indptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    indices = rng.integers(0, n, indptr[-1]).astype(np.int32)
    data = rng.random(indptr[-1]).astype(np.float32)
    return CSRGraph(indptr=indptr, indices=indices, data=data, shape=(n, n))


def test_quantize_passes_valid_and_optimal():
    """_quantize_passes: rounds up, stays nonincreasing, respects the
    value budget, and is slot-optimal vs brute force on a small case."""
    import itertools

    from gcn_tpu.tile.ell import _quantize_passes

    passes = np.array([9, 9, 7, 5, 5, 4, 2, 1, 1, 1], dtype=np.int64)
    for s in (2, 3, 4):
        q = _quantize_passes(passes, s)
        assert (q >= passes).all()
        assert (np.diff(q) <= 0).all()
        vals = np.unique(passes)
        assert len(np.unique(q)) <= s
        # brute force: every <=s-subset of distinct values containing max
        best = None
        for r_ in range(1, s + 1):
            for sub in itertools.combinations(vals.tolist(), r_):
                if max(sub) < passes.max():
                    continue
                arr = np.array(sorted(sub))
                cost = arr[np.searchsorted(arr, passes)].sum()
                best = cost if best is None else min(best, cost)
        assert q.sum() == best, (q.sum(), best)
    # under-budget: identity
    np.testing.assert_array_equal(_quantize_passes(passes, 10), passes)


def test_pass_ladder_kpad128_matches_dense(rng):
    """k_pad=128 (P=1) on a degree-sorted graph with >48 distinct window
    max degrees: the pass ladder caps spans at the segment budget while
    the SpMM (fwd + grad) stays exact. This is the wide-feature
    single-gather-pass configuration (one pass for k<=128 instead of
    k/32 column chunks)."""
    from gcn_tpu.tile.ell import _MAX_REDUCE_SEGMENTS

    g = _ladder_graph(rng)
    n = g.shape[0]
    for spl in (0, None):  # serving and (scaled) training default
        adj = ell_adjacency(g, r=8, k_pad=128, span_pass_limit=spl,
                            symmetric=False)
        adj.validate()
        assert adj.spans, "ladder must keep the grouped-reduce path"
        assert len(adj.spans) <= _MAX_REDUCE_SEGMENTS
        for k in (32, 96):
            x = rng.standard_normal((n, k)).astype(np.float32)
            out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
            ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        ct = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
        _, vjp = jax.vjp(lambda xx: spmm_ell(adj, xx), x)
        dx = np.asarray(vjp(ct)[0])
        refd = g.to_dense().astype(np.float64).T @ np.asarray(ct, np.float64)
        np.testing.assert_allclose(dx, refd, rtol=1e-4, atol=1e-4)


def test_span_limit_default_scales_with_kpad(rng):
    """The default span_pass_limit budgets a constant 64 slots/row:
    16 passes at k_pad=32, 64 at k_pad=128 — so the hub-split cap (and
    the training compile budget it protects) is packing-invariant."""
    g = random_graph(rng, n=96, m=700, symmetric=True)
    g = g.permute(degree_sort_order(g))
    a32 = ell_adjacency(g, r=8, k_pad=32)
    a128 = ell_adjacency(g, r=8, k_pad=128)
    assert a32.span_pass_limit == 16
    assert a128.span_pass_limit == 64
    assert a32.span_pass_limit * a32.p == a128.span_pass_limit * a128.p


def test_hub_split_wide_kpad_keeps_grouped_reduce(rng):
    """Round-5 regression: the TRAINING default (hub split on) at
    k_pad>=64 must keep the fused grouped reduce. Balanced hub chunks
    oscillate in [cap/2, cap], breaking the monotone pass order; the
    nonincreasing-envelope repair + ladder (_ladder_passes) restores
    contiguous spans within the segment budget — before the fix these
    configs silently fell to the Pallas fallback (measured 36 ms vs
    ~16 ms per h128 train step on arxiv). Numerics pinned vs dense."""
    from gcn_tpu.tile.ell import _MAX_REDUCE_SEGMENTS

    # hub-heavy power-law-ish graph: many rows above the split cap
    n = 600
    deg = np.minimum((rng.pareto(1.0, n) * 12 + 1).astype(np.int64),
                     n - 1)
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, rows.size)
    from gcn_tpu.graph.csr import coo_to_csr
    g = coo_to_csr(rows, cols, np.ones(rows.size, np.float32), (n, n))
    g = g.permute(degree_sort_order(g))
    for kp in (64, 128):
        adj = ell_adjacency(g, r=8, k_pad=kp, symmetric=False)
        adj.validate()
        assert adj.n_hub > 0, "graph must actually split hubs"
        assert adj.spans, \
            f"k_pad={kp} training default lost the grouped reduce"
        assert len(adj.spans) <= _MAX_REDUCE_SEGMENTS
        x = rng.standard_normal((n, kp)).astype(np.float32)
        out = np.asarray(spmm_ell(adj, jnp.asarray(x)))
        ref = g.to_dense().astype(np.float64) @ x.astype(np.float64)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
