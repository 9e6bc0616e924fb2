import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.data.registry import get_dataset
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
from gcn_tpu.ops.adjacency import coo_adjacency
from gcn_tpu.parallel import (create_mesh, make_sharded_gcn_train_step,
                              shard_graph_by_rows)
from gcn_tpu.parallel.partition import pad_rows
from gcn_tpu.reorder import reorder_graph
from gcn_tpu.train.optim import adam_l2

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    data = get_dataset("synth-small", seed=0)
    g = gcn_normalize(data.adj)
    return data, g


def test_shard_graph_roundtrip(setup):
    data, g = setup
    sg = shard_graph_by_rows(g, N_DEV)
    # every edge present exactly once
    rows_local = np.asarray(sg.rows_local)
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)
    dense = np.zeros((sg.n_rows_padded, g.shape[1]), np.float32)
    for s in range(N_DEV):
        np.add.at(dense, (rows_local[s] + s * sg.rows_per_shard, cols[s]),
                  vals[s])
    assert np.allclose(dense[: g.shape[0]], g.to_dense(), atol=1e-6)


def test_boundary_fraction_improves_with_reorder(setup):
    data, g = setup
    frac_orig = shard_graph_by_rows(g, N_DEV).boundary_fraction()
    g_re, _ = reorder_graph(g, "rabbit", prefer_native=True)
    frac_re = shard_graph_by_rows(g_re, N_DEV).boundary_fraction()
    assert frac_re < frac_orig


def test_sharded_forward_matches_single_device(setup):
    data, g = setup
    mesh = create_mesh(N_DEV)
    sg = shard_graph_by_rows(g, N_DEV)
    params = init_gcn_params(jax.random.PRNGKey(0), data.num_features, 16,
                             data.num_classes)
    x = pad_rows(data.features, sg)
    _, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, adam_l2(), dropout=0.0)
    adj, xs, ys, ms = shard_fn(sg, x, pad_rows(data.labels, sg),
                               pad_rows(np.ones(g.shape[0]), sg))
    lp_sharded = np.asarray(eval_fn(params, adj, xs))[: g.shape[0]]

    ref_adj = coo_adjacency(g, symmetric=True)
    lp_ref = np.asarray(gcn_forward(params, jnp.asarray(data.features),
                                    ref_adj))
    np.testing.assert_allclose(lp_sharded, lp_ref, rtol=1e-4, atol=1e-4)


def test_sharded_training_converges(setup):
    data, g = setup
    mesh = create_mesh(N_DEV)
    sg = shard_graph_by_rows(g, N_DEV)
    params = init_gcn_params(jax.random.PRNGKey(0), data.num_features, 16,
                             data.num_classes)
    tx = adam_l2(0.01, 5e-4)
    train_step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.5)
    mask = np.zeros(g.shape[0], np.float32)
    mask[data.idx_train] = 1.0
    adj, xs, ys, ms = shard_fn(sg, pad_rows(data.features, sg),
                               pad_rows(data.labels, sg), pad_rows(mask, sg))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        rng, r = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, r, adj, xs,
                                             ys, ms)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0]
    # test accuracy via sharded eval
    lp = np.asarray(eval_fn(params, adj, xs))[: g.shape[0]]
    pred = lp.argmax(1)
    acc = (pred[data.idx_test] == data.labels[data.idx_test]).mean()
    assert acc > 0.75


def test_grad_matches_single_device(setup):
    """Gradients through shard_map must equal single-device gradients."""
    data, g = setup
    mesh = create_mesh(N_DEV)
    sg = shard_graph_by_rows(g, N_DEV)
    params = init_gcn_params(jax.random.PRNGKey(0), data.num_features, 8,
                             data.num_classes)
    tx = adam_l2(0.01, 0.0)
    train_step, _, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0)
    mask = np.zeros(g.shape[0], np.float32)
    mask[data.idx_train] = 1.0
    adj, xs, ys, ms = shard_fn(sg, pad_rows(data.features, sg),
                               pad_rows(data.labels, sg), pad_rows(mask, sg))
    rng = jax.random.PRNGKey(2)
    p1, _, loss_sharded = train_step(params, tx.init(params), rng, adj, xs,
                                     ys, ms)

    # single-device reference loss/grad
    ref_adj = coo_adjacency(g, symmetric=True)
    idx_train = jnp.asarray(data.idx_train)

    def ref_loss(p):
        lp = gcn_forward(p, jnp.asarray(data.features), ref_adj,
                         dropout_rate=0.0, train=False)
        picked = jnp.take_along_axis(
            jnp.take(lp, idx_train, 0),
            jnp.take(jnp.asarray(data.labels), idx_train, 0)[:, None], 1)
        return -jnp.mean(picked)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(params)
    assert abs(float(loss_sharded) - float(loss_ref)) < 1e-4


class TestHaloExchange:
    def _setup(self, rng, n=256, n_shards=4):
        from gcn_tpu.data.synthetic import class_features, sbm
        from gcn_tpu.graph.normalize import gcn_normalize
        from gcn_tpu.parallel import (build_halo_plan, create_mesh,
                                      make_sharded_gcn_train_step,
                                      shard_graph_by_rows)
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        adj, labels = sbm(n=n, n_classes=4, avg_degree=8.0, seed=3)
        g = gcn_normalize(adj)
        x = class_features(labels, feat_dim=16, seed=3)
        sg = shard_graph_by_rows(g, n_shards)
        return g, x, labels, sg

    def test_plan_covers_all_real_edges(self, rng):
        from gcn_tpu.parallel import build_halo_plan, shard_graph_by_rows

        g, x, labels, sg = self._setup(rng)
        plan = build_halo_plan(sg)
        # every real edge's remap points at a halo slot holding its column
        send = np.asarray(plan.send_idx)
        remap = np.asarray(plan.col_remap)
        cols = np.asarray(sg.cols)
        vals = np.asarray(sg.vals)
        rps = sg.rows_per_shard
        ns, h = sg.n_shards, plan.h_max
        for d in range(sg.n_shards):
            real = vals[d] != 0
            r = remap[d][real]
            local = r >= ns * h
            # on-shard edges: direct band offset
            np.testing.assert_array_equal(
                d * rps + (r[local] - ns * h), cols[d][real][local])
            # off-shard edges: resolve through the send tables
            s = r[~local] // h
            pos = r[~local] % h
            reconstructed = s * rps + send[s, d, pos]
            np.testing.assert_array_equal(reconstructed, cols[d][real][~local])

    def test_halo_matches_all_gather_training(self, rng):
        import jax

        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)

        results = {}
        for exchange in ("halo", "all_gather"):
            from gcn_tpu.models.gcn_core import init_gcn_params

            params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange=exchange)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for i in range(3):
                params, opt_state, loss = step(params, opt_state,
                                               jax.random.PRNGKey(7), adj,
                                               xs, ys, ms)
                losses.append(float(loss))
            results[exchange] = (losses, np.asarray(eval_fn(params, adj, xs)))

        np.testing.assert_allclose(results["halo"][0],
                                   results["all_gather"][0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(results["halo"][1],
                                   results["all_gather"][1],
                                   rtol=1e-3, atol=1e-4)

    def test_ragged_plan_covers_all_real_edges(self, rng):
        from gcn_tpu.parallel import (build_halo_plan_ragged,
                                      shard_graph_by_rows)

        g, x, labels, sg = self._setup(rng)
        plan = build_halo_plan_ragged(sg)
        send = np.asarray(plan.send_idx)
        remap = np.asarray(plan.col_remap)
        cols = np.asarray(sg.cols)
        vals = np.asarray(sg.vals)
        rps = sg.rows_per_shard
        ns = sg.n_shards
        # receive-segment base per offset t (mirrors the builder)
        base, off = {}, 8
        send_off = {}
        so = 0
        for t in range(1, ns):
            base[t] = off
            send_off[t] = so
            off += plan.sizes[t - 1]
            so += plan.sizes[t - 1]
        assert off == plan.halo_rows
        for d in range(ns):
            real = vals[d] != 0
            r = remap[d][real]
            local = r >= plan.halo_rows
            np.testing.assert_array_equal(
                d * rps + (r[local] - plan.halo_rows),
                cols[d][real][local])
            # off-shard: walk back through the offset segment to the
            # source device's send table
            for rv, cv in zip(r[~local], cols[d][real][~local]):
                t = next(t for t in range(1, ns)
                         if base[t] <= rv < base[t] + plan.sizes[t - 1])
                s = (d - t) % ns
                pos = rv - base[t]
                assert s * rps + send[s, send_off[t] + pos] == cv

    def test_ragged_exchange_not_larger_than_padded(self, rng):
        from gcn_tpu.parallel import (build_halo_plan,
                                      build_halo_plan_ragged,
                                      shard_graph_by_rows)

        g, x, labels, sg = self._setup(rng)
        padded = build_halo_plan(sg)
        ragged = build_halo_plan_ragged(sg)
        assert ragged.exchange_fraction <= padded.exchange_fraction + 1e-9

    def test_halo_padded_matches_ragged_training(self, rng):
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        results = {}
        for exchange in ("halo", "halo_padded"):
            params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange=exchange)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state,
                                               jax.random.PRNGKey(7), adj,
                                               xs, ys, ms)
                losses.append(float(loss))
            results[exchange] = (losses,
                                 np.asarray(eval_fn(params, adj, xs)))
        np.testing.assert_allclose(results["halo"][0],
                                   results["halo_padded"][0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(results["halo"][1],
                                   results["halo_padded"][1],
                                   rtol=1e-3, atol=1e-4)

    def test_bf16_wire_exchange_tracks_f32(self, rng):
        """exchange_dtype='bf16' halves wire bytes; training must track
        the f32-wire run within bf16 rounding (and still converge) on
        the ragged and padded exchange flavors (the hierarchical plan
        shares the same cast points; see test_hier_halo_matches_unsharded
        for its numerics)."""
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        for exchange in ("halo", "halo_padded"):
            results = {}
            for dt in (None, "bf16"):
                params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
                step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                    mesh, sg, tx, dropout=0.0, exchange=exchange,
                    exchange_dtype=dt)
                adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                           pad_rows(labels, sg),
                                           pad_rows(mask, sg))
                opt_state = tx.init(params)
                losses = []
                for _ in range(5):
                    params, opt_state, loss = step(
                        params, opt_state, jax.random.PRNGKey(7), adj,
                        xs, ys, ms)
                    losses.append(float(loss))
                results[dt] = losses
            # bf16 wire rounds the boundary rows once per exchange:
            # loose tolerance, but the trajectories must stay together
            # and decrease
            np.testing.assert_allclose(results[None], results["bf16"],
                                       rtol=0.05, atol=0.02)
            assert results["bf16"][-1] < results["bf16"][0]

    def test_fp8_wire_tracks_f32_and_saturates_safely(self, rng):
        """exchange_dtype='fp8' quarters wire bytes (float8_e4m3fn, ~6%
        max per-element rounding on boundary rows, both directions).
        Training must stay close to the f32-wire run, converge, and end
        at matching accuracy; and because e4m3fn converts overflow to
        NaN, the pre-cast clip must keep a huge-magnitude payload finite
        (halo._prep_send)."""
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        acc = {}
        for dt in (None, "fp8"):
            params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange="halo",
                exchange_dtype=dt)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for _ in range(40):
                params, opt_state, loss = step(
                    params, opt_state, jax.random.PRNGKey(7), adj, xs,
                    ys, ms)
                losses.append(float(loss))
            assert all(np.isfinite(losses)), dt
            assert losses[-1] < losses[0], dt
            lp = np.asarray(eval_fn(params, adj, xs))[:g.shape[0]]
            acc[dt] = float((lp.argmax(1) == labels).mean())
        # fp8 rounds boundary rows ~6%/element; at convergence both wires
        # must solve this (easily separable) workload and agree closely
        assert acc[None] >= 0.9, acc
        assert abs(acc["fp8"] - acc[None]) <= 0.04, acc

        # saturation safety: payload far beyond the e4m3fn max (448)
        # must clip, not NaN — scale the features by 1e4
        params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
        step, eval_fn, shard_fn = make_sharded_gcn_train_step(
            mesh, sg, tx, dropout=0.0, exchange="halo",
            exchange_dtype="fp8")
        adj, xs, ys, ms = shard_fn(sg, pad_rows(x * 1e4, sg),
                                   pad_rows(labels, sg),
                                   pad_rows(mask, sg))
        _, _, loss = step(params, tx.init(params), jax.random.PRNGKey(7),
                          adj, xs, ys, ms)
        assert np.isfinite(float(loss))

    def test_exchange_fraction_small_for_banded_graph(self, rng):
        from gcn_tpu.graph.csr import coo_to_csr
        from gcn_tpu.graph.normalize import gcn_normalize
        from gcn_tpu.parallel import build_halo_plan, shard_graph_by_rows

        # locality-ordered graph: edges within +-4 positions, so only the
        # band seams are boundary rows -> halo must be far below all-gather
        n = 512
        src = np.repeat(np.arange(n), 4)
        dst = (src + rng.integers(1, 5, src.shape)) % n
        g = gcn_normalize(coo_to_csr(
            src, dst, np.ones(len(src), np.float32), (n, n)).symmetrize())
        sg = shard_graph_by_rows(g, 4)
        plan = build_halo_plan(sg)
        assert plan.exchange_fraction < 0.35, plan.exchange_fraction

    def test_ell_kernel_matches_segsum(self, rng):
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        results = {}
        for kernel in ("ell", "segsum"):
            params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange="halo", kernel=kernel)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state,
                                               jax.random.PRNGKey(7), adj,
                                               xs, ys, ms)
                losses.append(float(loss))
            results[kernel] = (losses, np.asarray(eval_fn(params, adj, xs)))
        np.testing.assert_allclose(results["ell"][0], results["segsum"][0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(results["ell"][1], results["segsum"][1],
                                   rtol=1e-3, atol=1e-4)

    def test_halo_with_empty_band(self, rng):
        """A shard whose band has no edges must not break the plan."""
        import jax

        from gcn_tpu.graph.csr import coo_to_csr
        from gcn_tpu.graph.normalize import gcn_normalize
        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import (build_halo_plan, create_mesh,
                                      make_sharded_gcn_train_step,
                                      shard_graph_by_rows)
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        n = 256
        # all edges among the first 64 rows: bands 2-4 empty
        src = rng.integers(0, 64, 400)
        dst = rng.integers(0, 64, 400)
        g = gcn_normalize(coo_to_csr(
            src, dst, np.ones(400, np.float32), (n, n)).symmetrize())
        sg = shard_graph_by_rows(g, 4)
        plan = build_halo_plan(sg)
        mesh = create_mesh(4)
        tx = adam_l2()
        params = init_gcn_params(jax.random.PRNGKey(0), 8, 4, 3)
        for kernel in ("segsum", "ell"):
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange="halo", kernel=kernel)
            x = rng.standard_normal((n, 8)).astype(np.float32)
            labels = rng.integers(0, 3, n)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(np.ones(n, np.float32), sg))
            p, o, loss = step(params, tx.init(params),
                              jax.random.PRNGKey(1), adj, xs, ys, ms)
            assert np.isfinite(float(loss))

    def test_band_degree_sort_preserves_boundary(self, rng):
        from gcn_tpu.parallel import build_halo_plan, shard_graph_by_rows
        from gcn_tpu.parallel.partition import band_degree_sort_order
        from gcn_tpu.tile import ell_adjacency

        g, x, labels, sg = self._setup(rng, n=512)
        plan0 = build_halo_plan(sg)
        rps = sg.rows_per_shard
        perm = band_degree_sort_order(g, rps)
        g2 = g.permute(perm)
        sg2 = shard_graph_by_rows(g2, sg.n_shards)
        plan2 = build_halo_plan(sg2)
        # boundary size unchanged (rows only relabel within their band)
        assert plan2.h_max == plan0.h_max
        assert abs(sg2.boundary_fraction() - sg.boundary_fraction()) < 1e-9
        # per-band fill improves (or at worst matches)
        f0 = ell_adjacency(g, r=16).pad_fraction
        f2 = ell_adjacency(g2, r=16).pad_fraction
        assert f2 <= f0 + 1e-9

    def test_overlap_split_matches(self, rng):
        """interior+boundary overlapped path == monolithic ELL path."""
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        results = {}
        for overlap in (True, False):
            params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange="halo", kernel="ell",
                overlap=overlap)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state,
                                               jax.random.PRNGKey(7), adj,
                                               xs, ys, ms)
                losses.append(float(loss))
            results[overlap] = (losses,
                                np.asarray(eval_fn(params, adj, xs)))
        np.testing.assert_allclose(results[True][0], results[False][0],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("wire", [None, "bf16", "fp8"])
    def test_chunked_exchange_matches_monolithic(self, rng, wire):
        """k-chunked pipelined exchange == monolithic, fwd AND training.

        Each boundary-output column depends only on its halo column, so
        chunking the exchange along k is exact — including under the
        bf16 and fp8 wires, where (rows @ w)[:, c] and rows @ w[:, c]
        clip+round to identical wire payloads. This is the overlap window the
        full-step weak-scaling projection credits; the step must
        implement what the model credits."""
        import jax

        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step
        from gcn_tpu.parallel.partition import pad_rows
        from gcn_tpu.train.optim import adam_l2

        g, x, labels, sg = self._setup(rng)
        mesh = create_mesh(4)
        tx = adam_l2(0.01, 5e-4)
        mask = np.ones(g.shape[0], np.float32)
        results = {}
        # nhid=40 > chunk=16 -> layer 1 exchanges in 3 slices (16/16/8);
        # nclass=4 < chunk -> layer 2 stays monolithic (the fallthrough)
        for chunk in (16, None):
            params = init_gcn_params(jax.random.PRNGKey(0), 16, 40, 4)
            step, eval_fn, shard_fn = make_sharded_gcn_train_step(
                mesh, sg, tx, dropout=0.0, exchange="halo", kernel="ell",
                overlap=True, exchange_dtype=wire, exchange_chunk=chunk)
            adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                       pad_rows(labels, sg),
                                       pad_rows(mask, sg))
            opt_state = tx.init(params)
            losses = []
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state,
                                               jax.random.PRNGKey(7), adj,
                                               xs, ys, ms)
                losses.append(float(loss))
            results[chunk] = (losses, np.asarray(eval_fn(params, adj, xs)))
        np.testing.assert_allclose(results[16][0], results[None][0],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(results[16][1], results[None][1],
                                   rtol=1e-5, atol=1e-6)


def test_2d_mesh_data_x_model_matches_unsharded(rng):
    """2-D mesh: row bands ("data") x tensor parallelism ("model").
    Full training step + eval on a 4x2 mesh must match the unsharded
    forward with the same post-step weights."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
    from gcn_tpu.ops.adjacency import device_adjacency
    from gcn_tpu.parallel import (create_mesh_2d,
                                  make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n, classes, feat, hid = 512, 5, 32, 16
    adj_g, labels = sbm(n=n, n_classes=classes, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=feat, seed=3)

    mesh = create_mesh_2d(4, 2)
    sg = shard_graph_by_rows(g, 4)
    params = init_gcn_params(jax.random.PRNGKey(0), feat, hid, classes)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, model_axis="model")
    mask = np.ones(n, np.float32)
    adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                               pad_rows(mask, sg))
    opt = tx.init(params)
    p2, opt, loss = step(params, opt, jax.random.PRNGKey(1), adj, xs, ys,
                         ms)
    assert np.isfinite(float(loss))
    lp = np.asarray(eval_fn(p2, adj, xs))[:n]

    p_host = jax.device_get(p2)  # drop the model-sharded layout
    lp_ref = gcn_forward(p_host, jnp.asarray(x),
                         device_adjacency(g, "dense"),
                         orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp, np.asarray(lp_ref), rtol=5e-4,
                               atol=5e-4)

    # a second step keeps training (loss decreases over a few steps)
    losses = [float(loss)]
    for i in range(4):
        p2, opt, loss = step(p2, opt, jax.random.PRNGKey(2 + i), adj, xs,
                             ys, ms)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_2d_mesh_indivisible_widths_pad(rng):
    """nfeat=31, nhid=13 on a model axis of 2: pad_model_params +
    shard_fn's column padding must train identically to the unpadded
    model (padded entries stay exactly zero)."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
    from gcn_tpu.ops.adjacency import device_adjacency
    from gcn_tpu.parallel import (create_mesh_2d,
                                  make_sharded_gcn_train_step,
                                  pad_model_params, shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n, classes, feat, hid = 256, 4, 31, 13
    adj_g, labels = sbm(n=n, n_classes=classes, avg_degree=8.0, seed=5)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=feat, seed=5)

    mesh = create_mesh_2d(4, 2)
    sg = shard_graph_by_rows(g, 4)
    params = init_gcn_params(jax.random.PRNGKey(0), feat, hid, classes)
    params_pad = pad_model_params(params, 2)
    assert params_pad["gc1"]["w"].shape == (32, 14)
    assert params_pad["gc2"]["w"].shape == (14, classes)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, model_axis="model")
    mask = np.ones(n, np.float32)
    adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                               pad_rows(mask, sg))
    assert xs.shape[1] == 32  # shard_fn padded the feature columns
    p2 = params_pad
    opt = tx.init(params_pad)
    for i in range(3):
        p2, opt, loss = step(p2, opt, jax.random.PRNGKey(1 + i), adj, xs,
                             ys, ms)
    lp = np.asarray(eval_fn(p2, adj, xs))[:n]

    p_host = jax.device_get(p2)
    # padded entries are still exactly zero after optimizer steps
    assert not np.abs(p_host["gc1"]["w"][feat:]).any()
    assert not np.abs(p_host["gc1"]["w"][:, hid:]).any()
    assert not np.abs(p_host["gc1"]["b"][hid:]).any()
    assert not np.abs(p_host["gc2"]["w"][hid:]).any()
    p_trim = {
        "gc1": {"w": p_host["gc1"]["w"][:feat, :hid],
                "b": p_host["gc1"]["b"][:hid]},
        "gc2": {"w": p_host["gc2"]["w"][:hid], "b": p_host["gc2"]["b"]},
    }
    lp_ref = gcn_forward(p_trim, jnp.asarray(x),
                         device_adjacency(g, "dense"),
                         orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp, np.asarray(lp_ref), rtol=5e-4,
                               atol=5e-4)


def test_hier_halo_matches_unsharded(rng):
    """Hierarchical (host x chip) halo on a fake 2x4 mesh: train step +
    eval must match the unsharded forward, DCN rows must be at most the
    flat ragged inter-host volume, and training must converge with
    dropout on."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
    from gcn_tpu.ops.adjacency import device_adjacency
    from gcn_tpu.parallel import (build_halo_plan_hier,
                                  build_halo_plan_ragged, create_mesh_hier,
                                  make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n, classes, feat = 512, 5, 32
    adj_g, labels = sbm(n=n, n_classes=classes, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=feat, seed=3)
    mesh = create_mesh_hier(2, 4)
    sg = shard_graph_by_rows(g, 8)

    plan_h = build_halo_plan_hier(sg, 2, 4)
    plan_r = build_halo_plan_ragged(sg)
    # union dedup: DCN rows never exceed the flat plan's total exchange
    assert plan_h.dcn_fraction <= plan_r.exchange_fraction + 1e-9
    assert plan_h.ici_gather_rows >= 0

    params = init_gcn_params(jax.random.PRNGKey(0), feat, 16, classes)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, exchange="halo_hier")
    mask = np.ones(n, np.float32)
    adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                               pad_rows(mask, sg))
    p2, o2, loss = step(params, tx.init(params), jax.random.PRNGKey(1),
                        adj, xs, ys, ms)
    assert np.isfinite(float(loss))
    lp = np.asarray(eval_fn(p2, adj, xs))[:n]
    ref = gcn_forward(jax.device_get(p2), jnp.asarray(x),
                      device_adjacency(g, "dense"),
                      orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp, np.asarray(ref), rtol=5e-4, atol=5e-4)

    # bf16 wire: both hier levels (intra ppermutes, DCN unions + ICI
    # fan-out) cast on the wire only — eval must still track the
    # unsharded forward within bf16 rounding of the boundary rows
    step_b, eval_b, _ = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, exchange="halo_hier",
        exchange_dtype="bf16")
    p3, _, loss_b = step_b(params, tx.init(params), jax.random.PRNGKey(1),
                           adj, xs, ys, ms)
    assert np.isfinite(float(loss_b))
    assert abs(float(loss_b) - float(loss)) < 0.02
    lp_b = np.asarray(eval_b(p3, adj, xs))[:n]
    ref3 = gcn_forward(jax.device_get(p3), jnp.asarray(x),
                       device_adjacency(g, "dense"),
                       orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp_b, np.asarray(ref3), rtol=0.05, atol=0.03)

    # fp8 wire through both hier levels: coarser rounding (~6%/element on
    # boundary rows) but still finite, close in loss, and tracking the
    # unsharded forward at an fp8-scale tolerance
    step_q, eval_q, _ = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, exchange="halo_hier",
        exchange_dtype="fp8")
    p4, _, loss_q = step_q(params, tx.init(params), jax.random.PRNGKey(1),
                           adj, xs, ys, ms)
    assert np.isfinite(float(loss_q))
    assert abs(float(loss_q) - float(loss)) < 0.1
    lp_q = np.asarray(eval_q(p4, adj, xs))[:n]
    ref4 = gcn_forward(jax.device_get(p4), jnp.asarray(x),
                       device_adjacency(g, "dense"),
                       orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp_q, np.asarray(ref4), rtol=0.35, atol=0.25)

    # dropout path (flattened host*chip axis index in the rng fold)
    step_d, _, _ = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.5, exchange="halo_hier")
    p, o = params, tx.init(params)
    losses = []
    for i in range(5):
        p, o, loss = step_d(p, o, jax.random.PRNGKey(i), adj, xs, ys, ms)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_planners_scale_to_pod_slice(rng):
    """Pod-slice regime (VERDICT r2 weak #6): plan construction sorts each
    shard's slots by source once (O(E log E), no per-pair rescans), so a
    64-shard plan must build in seconds; every real edge's resolution is
    asserted inside the builders themselves."""
    import time

    from gcn_tpu.data.synthetic import sbm
    from gcn_tpu.parallel import (build_halo_plan_hier,
                                  build_halo_plan_ragged)

    adj, _ = sbm(n=8192, n_classes=16, avg_degree=12.0, seed=5)
    g = gcn_normalize(adj)
    sg = shard_graph_by_rows(g, 64)
    t0 = time.time()
    plan = build_halo_plan_ragged(sg)
    hier = build_halo_plan_hier(sg, 8, 8)
    assert time.time() - t0 < 30.0
    assert len(plan.sizes) == 63
    assert 0.0 < plan.exchange_fraction
    # host-level unions never ship more DCN rows than the flat plan's
    # per-peer segments cover in total
    assert hier.dcn_fraction <= plan.exchange_fraction + 1e-9


def test_hier_fanout_modes_agree(rng):
    """Ragged fan-out (round 4 default) vs all_gather fan-out: identical
    SpMM results (the fan segments carry exactly the needed subsets),
    strictly fewer ICI rows, same DCN rows."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.synthetic import class_features, powerlaw_sbm
    from gcn_tpu.parallel import (build_halo_plan_hier, create_mesh_hier,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.halo import dist_spmm_halo, make_halo_exchange
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.graph.normalize import gcn_normalize

    n = 512
    adj_g, labels = powerlaw_sbm(n=n, n_classes=5, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=16, seed=3)
    mesh = create_mesh_hier(2, 4)
    sg = shard_graph_by_rows(g, 8)

    plans = {m: build_halo_plan_hier(sg, 2, 4, fanout=m)
             for m in ("ragged", "all_gather")}
    pr, pa = plans["ragged"], plans["all_gather"]
    assert pr.inter_sizes == pa.inter_sizes          # DCN identical
    assert pr.ici_gather_rows <= pa.ici_gather_rows  # fan never larger
    assert pr.fan_sizes is not None and pa.fan_sizes is None

    from functools import partial as _p

    from jax.sharding import NamedSharding, PartitionSpec as P

    outs = {}
    for m, plan in plans.items():
        ex = make_halo_exchange(plan)
        arrs = plan.device_arrays

        @_p(jax.shard_map, mesh=mesh,
            in_specs=(tuple(P(("host", "chip"),
                             *([None] * (a.ndim - 1))) for a in
                            (sg.rows_local, sg.cols, sg.vals)),
                      tuple(P(("host", "chip"),
                              *([None] * (a.ndim - 1))) for a in arrs),
                      P(("host", "chip"), None)),
            out_specs=P(("host", "chip"), None), check_vma=False)
        def run(shard_arrays, plan_arrays, x_band):
            return dist_spmm_halo(shard_arrays, plan_arrays, x_band,
                                  sg.rows_per_shard, ("host", "chip"),
                                  exchange=ex)

        sharding = NamedSharding(mesh, P(("host", "chip"), None))
        put = lambda a, nd: jax.device_put(jnp.asarray(a), NamedSharding(
            mesh, P(("host", "chip"), *([None] * (nd - 1)))))
        shard_arrays = tuple(put(a, np.asarray(a).ndim)
                             for a in (sg.rows_local, sg.cols, sg.vals))
        plan_dev = tuple(put(a, np.asarray(a).ndim) for a in arrs)
        xs = jax.device_put(jnp.asarray(pad_rows(x, sg)), sharding)
        outs[m] = np.asarray(run(shard_arrays, plan_dev, xs))

    np.testing.assert_allclose(outs["ragged"], outs["all_gather"],
                               rtol=1e-6, atol=1e-7)
    # and both match the dense reference
    dense = np.zeros(g.shape, np.float32)
    indptr, idx = np.asarray(g.indptr), np.asarray(g.indices)
    for i in range(n):
        dense[i, idx[indptr[i]:indptr[i + 1]]] = np.asarray(
            g.data)[indptr[i]:indptr[i + 1]]
    ref = dense @ x
    np.testing.assert_allclose(outs["ragged"][:n], ref, rtol=1e-4,
                               atol=1e-5)


def test_hier_mesh_with_model_axis_matches_unsharded(rng):
    """3-D mesh (host x chip x model): hierarchical halo exchange + tensor
    parallelism compose — the dp(hier) x tp configuration a multi-host
    deployment runs. One train step + eval on a 2x2x2 mesh must match the
    unsharded dense forward."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
    from gcn_tpu.ops.adjacency import device_adjacency
    from gcn_tpu.parallel import (create_mesh_hier_model,
                                  make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n, classes, feat, nhid = 512, 4, 16, 16
    adj_g, labels = sbm(n=n, n_classes=classes, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=feat, seed=3)
    mesh = create_mesh_hier_model(2, 2, 2)
    sg = shard_graph_by_rows(g, 4)   # row bands span host x chip

    params = init_gcn_params(jax.random.PRNGKey(0), feat, nhid, classes)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, exchange="halo_hier",
        model_axis="model")
    mask = np.ones(n, np.float32)
    adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                               pad_rows(mask, sg))
    p2, _, loss = step(params, tx.init(params), jax.random.PRNGKey(1),
                       adj, xs, ys, ms)
    assert np.isfinite(float(loss))
    lp = np.asarray(eval_fn(p2, adj, xs))[:n]
    ref = gcn_forward(jax.device_get(p2), jnp.asarray(x),
                      device_adjacency(g, "dense"),
                      orders=("a_xw", "a_xw"), train=False)
    np.testing.assert_allclose(lp, np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_hier_chunked_exchange_matches_monolithic(rng):
    """k-chunked exchange composes with the hierarchical host x chip
    plan (the configuration the full-step projection credits at
    multi-host scale): chunk=16 at nhid=40 == monolithic, training and
    eval."""
    import jax

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import init_gcn_params
    from gcn_tpu.parallel import (create_mesh_hier,
                                  make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n = 512
    adj_g, labels = sbm(n=n, n_classes=4, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj_g)
    x = class_features(labels, feat_dim=16, seed=3)
    mesh = create_mesh_hier(2, 4)
    sg = shard_graph_by_rows(g, 8)
    tx = adam_l2(0.01, 5e-4)
    mask = np.ones(n, np.float32)
    results = {}
    for chunk in (16, None):
        params = init_gcn_params(jax.random.PRNGKey(0), 16, 40, 4)
        step, eval_fn, shard_fn = make_sharded_gcn_train_step(
            mesh, sg, tx, dropout=0.0, exchange="halo_hier",
            exchange_chunk=chunk)
        adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg),
                                   pad_rows(labels, sg),
                                   pad_rows(mask, sg))
        opt_state = tx.init(params)
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(7), adj,
                                           xs, ys, ms)
            losses.append(float(loss))
        results[chunk] = (losses, np.asarray(eval_fn(params, adj, xs)))
    np.testing.assert_allclose(results[16][0], results[None][0],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(results[16][1], results[None][1],
                               rtol=1e-5, atol=1e-6)


class TestLockstepShardedEll:
    """Round-4 lockstep layout: shards share one forced pass plan so the
    stacked EllAdj carries grouped-reduce spans (the sharded kernel no
    longer drops to the products-materializing Pallas fallback)."""

    def test_stacked_carries_uniform_spans(self, rng):
        from gcn_tpu.data.synthetic import sbm
        from gcn_tpu.graph.normalize import gcn_normalize
        from gcn_tpu.parallel import build_halo_plan, shard_graph_by_rows
        from gcn_tpu.parallel.halo import build_sharded_ell
        from gcn_tpu.parallel.partition import band_degree_sort_order

        adj, _ = sbm(n=512, n_classes=4, avg_degree=8.0, seed=3)
        g = gcn_normalize(adj)
        g = g.permute(band_degree_sort_order(g, 128))
        sg = shard_graph_by_rows(g, 4)
        plan = build_halo_plan(sg)
        for part in ("all", "interior", "boundary"):
            st = build_sharded_ell(sg, plan, part=part, span_pass_limit=0)
            assert st.spans and st.t_spans, part
            win = np.asarray(st.win)
            assert (win == win[0]).all(), "win must be shard-uniform"
            # spans describe the shared layout exactly
            b0, b1, pw, ws, we = st.spans[-1]
            assert b1 == win.shape[1]
            assert int(np.asarray(st.cols).shape[1]) == b1

    def test_lockstep_spmm_matches_dense(self, rng):
        """Grouped sharded SpMM (spans present) == dense, fwd and grad,
        k narrow and wide (k_pad=128 single-pass would engage at wide
        k_pad; default 32 pins the existing numerics)."""
        import jax

        from gcn_tpu.data.synthetic import sbm
        from gcn_tpu.graph.normalize import gcn_normalize
        from gcn_tpu.ops.ell_spmm import spmm_ell
        from gcn_tpu.parallel import build_halo_plan, shard_graph_by_rows
        from gcn_tpu.parallel.halo import build_sharded_ell, unstack_ell_shard
        from gcn_tpu.parallel.partition import band_degree_sort_order

        adj, _ = sbm(n=256, n_classes=4, avg_degree=8.0, seed=5)
        g = gcn_normalize(adj)
        g = g.permute(band_degree_sort_order(g, 64))
        sg = shard_graph_by_rows(g, 4)
        plan = build_halo_plan(sg)
        dense = g.to_dense().astype(np.float64)
        for k_pad, k in ((32, 16), (128, 48)):
            st = build_sharded_ell(sg, plan, k_pad=k_pad,
                                   span_pass_limit=0)
            assert st.spans
            x = rng.standard_normal((g.shape[0], k)).astype(np.float32)
            outs = []
            for d in range(sg.n_shards):
                one = jax.tree_util.tree_map(
                    lambda a, dd=d: a[dd:dd + 1]
                    if hasattr(a, "shape") and a.ndim and a.shape[0] == sg.n_shards
                    else a, st)
                shard = unstack_ell_shard(one)
                assert shard.spans == st.spans
                # feed the halo-remapped table directly (exchange is
                # covered elsewhere): table = concat(halo rows, band)
                table = np.zeros((shard.n_cols, k), np.float32)
                rps = sg.rows_per_shard
                # band part occupies the tail [n_cols-rps:)
                table[shard.n_cols - rps:] = x[d * rps:(d + 1) * rps]
                # halo part: place every remapped column's source row
                remap = np.asarray(plan.col_remap[d]).reshape(-1)
                vals_d = np.asarray(sg.vals[d]).reshape(-1)
                cols_g = np.asarray(sg.cols[d]).reshape(-1)
                hmask = (vals_d != 0) & (remap < shard.n_cols - rps)
                table[remap[hmask]] = x[cols_g[hmask]]
                outs.append(np.asarray(spmm_ell(shard, jnp.asarray(table))))
            got = np.concatenate(outs, axis=0)[:g.shape[0]]
            ref = dense @ x.astype(np.float64)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_recommend_wire_dtype_policy(rng):
    """Auto wire policy: flat plans -> bf16; hier plans pick fp8 only in
    the DCN-byte-bound regime (forced here by a tiny assumed DCN)."""
    from gcn_tpu.data.synthetic import sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.parallel.halo import (build_halo_plan_hier,
                                       build_halo_plan_ragged)
    from gcn_tpu.parallel.partition import (band_degree_sort_order,
                                            shard_graph_by_rows)
    from gcn_tpu.parallel.projection import recommend_wire_dtype

    adj, _ = sbm(n=1024, n_classes=8, avg_degree=10, seed=0)
    g = gcn_normalize(adj)
    sg0 = shard_graph_by_rows(g, 8)
    g = g.permute(band_degree_sort_order(g, sg0.rows_per_shard))
    sg = shard_graph_by_rows(g, 8)

    flat = build_halo_plan_ragged(sg)
    wire, why = recommend_wire_dtype(sg, flat)
    assert wire == "bf16" and "single-level" in why["reason"]

    hier = build_halo_plan_hier(sg, 4, 2)
    # generous DCN: bf16 already hides -> bf16 (the tiny test graph has
    # almost no per-device compute, so genuinely generous bandwidth is
    # needed to model the compute-rich production regime)
    wire, why = recommend_wire_dtype(sg, hier, widths=(128, 128, 40),
                                     spmm_edges_per_s=346e6,
                                     bw_dcn=1e12)
    assert wire == "bf16" and why["eff_bf16"] >= 0.9
    # starved DCN: bf16 misses 90%, fp8 helps -> fp8
    wire2, why2 = recommend_wire_dtype(sg, hier, widths=(128, 128, 40),
                                       spmm_edges_per_s=346e6,
                                       bw_dcn=1e7)
    assert why2["eff_bf16"] < 0.9
    assert wire2 == "fp8" and why2["eff_fp8"] > why2["eff_bf16"]


def test_lockstep_vs_matched_dcn_bounds(rng):
    """matched is a FEASIBLE schedule (>= the rank bound, the proven
    lower envelope of any round schedule) and the rank bound dominates
    the padding-free mean; lockstep is what the shipped offset schedule
    ships."""
    from gcn_tpu.data.synthetic import powerlaw_sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.parallel.halo import _pair_boundaries
    from gcn_tpu.parallel.partition import (band_degree_sort_order,
                                            shard_graph_by_rows)
    from gcn_tpu.parallel.projection import lockstep_vs_matched_dcn

    d, nh, nc = 16, 4, 4
    adj, _ = powerlaw_sbm(n=2048, n_classes=8, avg_degree=12, seed=1)
    g = gcn_normalize(adj)
    sg0 = shard_graph_by_rows(g, d)
    g = g.permute(band_degree_sort_order(g, sg0.rows_per_shard))
    sg = shard_graph_by_rows(g, d)
    needed, _ = _pair_boundaries(sg)
    r = lockstep_vs_matched_dcn(needed, d, nh, nc)
    assert r["mean"] <= r["rank_bound"] + 8 * (nh - 1)
    assert r["rank_bound"] <= r["matched"]
    assert r["matched"] <= r["lockstep"] * 1.001 + 8 * (nh - 1)
    assert r["lockstep"] > 0


def test_blocks_partition_matches_dense(rng):
    """build_sharded_ell_blocks: the pass-block partition's two kernels
    (interior-only over the band + halo-touching over concat(halo,
    band)) must sum to the exact SpMM, at monolithic-layout slot cost
    (round 5 — the shipped overlap form)."""
    from gcn_tpu.data.synthetic import powerlaw_sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.ops.ell_spmm import spmm_ell
    from gcn_tpu.parallel import band_degree_sort_order, shard_graph_by_rows
    from gcn_tpu.parallel.halo import (build_halo_plan_ragged,
                                       build_sharded_ell_blocks,
                                       unstack_ell_shard)

    adj, _ = powerlaw_sbm(n=1024, n_classes=8, avg_degree=12, seed=3)
    g = gcn_normalize(adj)
    ns = 4
    sg0 = shard_graph_by_rows(g, ns)
    g = g.permute(band_degree_sort_order(g, sg0.rows_per_shard))
    sg = shard_graph_by_rows(g, ns)
    plan = build_halo_plan_ragged(sg)
    dense = g.to_dense().astype(np.float64)
    for kp in (32, 128):
        a_int, a_halo = build_sharded_ell_blocks(sg, plan, k_pad=kp,
                                                 r=32)
        rps, halo_cols = sg.rows_per_shard, plan.halo_rows
        k = 40
        x = rng.standard_normal((g.shape[0], k)).astype(np.float32)
        outs = []
        for d in range(ns):
            def sl(adj_s, dd=d):
                return unstack_ell_shard(jax.tree_util.tree_map(
                    lambda a: a[dd:dd + 1]
                    if hasattr(a, "ndim") and a.ndim
                    and a.shape[0] == ns else a, adj_s))
            ai, ah = sl(a_int), sl(a_halo)
            if d == 0:
                ai.validate()
                ah.validate()
            n0, n1 = d * rps, min((d + 1) * rps, g.shape[0])
            x_band = np.zeros((rps, k), np.float32)
            x_band[:n1 - n0] = x[n0:n1]
            table = np.zeros((halo_cols + rps, k), np.float32)
            table[halo_cols:] = x_band
            remap = np.asarray(plan.col_remap[d]).reshape(-1)
            vals_d = np.asarray(sg.vals[d]).reshape(-1)
            cols_g = np.asarray(sg.cols[d]).reshape(-1)
            hm = (vals_d != 0) & (remap < halo_cols)
            table[remap[hm]] = x[cols_g[hm]]
            outs.append(np.asarray(spmm_ell(ai, jnp.asarray(x_band)))
                        + np.asarray(spmm_ell(ah, jnp.asarray(table))))
        got = np.concatenate(outs)[:g.shape[0]]
        np.testing.assert_allclose(got, dense @ x.astype(np.float64),
                                   rtol=1e-4, atol=1e-4)
