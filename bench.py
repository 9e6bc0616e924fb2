"""SpMM benchmark — prints ONE JSON line for the driver.

Metric: packed-ELL SpMM throughput (edges/s) on an ogbn-arxiv-sized
synthetic power-law graph (n=169343, ~2.3M directed edges after
symmetrization) at feature width k=32, after Rabbit reordering + degree
sort (the v6 pipeline), with the fully-grouped-XLA pass reduce — the
serving configuration (EllAdj.span_pass_limit=0; forward-only programs
compile in ~30 s). The training default (span_pass_limit=16 WITH hub-row
splitting — hub rows refined into <=16-pass virtual chunks + prefix
epilogue, so the whole matrix takes the fused grouped reduce; measured
within ~2% of serving where the round-2 merged-Pallas hub region
conceded ~9%) is reported alongside as ell_ms_train_default; both are
first-class shipped configurations (ops/ell_spmm.py, tile/ell.py).

vs_baseline: speedup over the XLA-native COO gather+segment-sum SpMM — the
cuSPARSE-equivalent vendor path this framework's kernel replaces
(reference: cuspmm.cu:23-68 vs flexspmm.cu).

Roofline (the `roofline_pct` detail): arbitrary-pattern SpMM on TPU is
bound by the XLA row-gather primitive — one row read per edge slot. The
bound is MEASURED IN SITU here, not quoted: a chained stride-sum gather
(the kernel's own consumption pattern, no SpMM math) over a table of the
same height/width/dtype gives ns/slot; roofline_ms = slots x ns_slot and
roofline_pct = 100 * roofline_ms / ell_ms. The standalone sweep behind
this protocol (gather rate vs table height/dtype, HBM stream comparison
showing the gather is issue-rate- not bandwidth-bound) is
examples/bench_gather.py -> results/gather_microbench.json.

Timing protocol (axon relay specifics): the relay caches identical
executions and block_until_ready does not actually block, so every
measurement uses a fresh input and a scalar readback for sync; a measured
no-op roundtrip is subtracted. Work is chained inside a fori_loop so no
iteration can be elided.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync_overhead(x):
    nul = jax.jit(lambda xx: jnp.sum(xx[:8, :8]))
    float(nul(x))
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        float(nul(x * (1 + r * 1e-3)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_spmm(fn, args, x0, overhead, inner=30, rounds=3):
    run = jax.jit(lambda a, xx: jnp.sum(jax.lax.fori_loop(
        0, inner, lambda i, acc: fn(a, acc) * 0.999 + xx * 1e-6, xx)))
    float(run(args, x0 * 0.5))  # compile + warm
    best = 1e9
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        float(run(args, x0 * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best


_T0 = time.time()
# wall-clock budget for the OPTIONAL train-step detail benches: their
# first-ever compile through the relay can take minutes; the primary
# SpMM metric + roofline always complete first and must never be lost
# to a driver timeout. History: 480 s fit both details on a warm relay
# cache (round 3, full run ~6 min) but a COLD cache pushed the primary
# past the first gate and shipped -1 sentinels (round 4). 780 s covers
# a fully cold run (primary ~4 min cold + ~2.5 min for both detail
# compiles) with the gates below still bounding the worst case. The
# other -1 cause is CPU CONTENTION: this host has ONE core, so any
# concurrent heavy process (e.g. a pytest suite) inflates every phase
# ~2x — run bench.py on a quiet host.
_DETAIL_BUDGET_S = 780.0


def main():
    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.ops.adjacency import coo_adjacency
    from gcn_tpu.ops.ell_spmm import spmm_ell
    from gcn_tpu.ops.spmm import spmm
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.tile import degree_sort_order, ell_adjacency

    k = 32
    data = get_dataset("synth-arxiv", seed=0)
    g = gcn_normalize(data.adj)
    g_re, _ = reorder_graph(g, "rabbit")
    g_re = g_re.permute(degree_sort_order(g_re))
    n, e = g.shape[0], g.nnz
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, k)).astype(np.float32)
        * 0.01)
    overhead = _sync_overhead(x0)

    # primary: the serving configuration (span_pass_limit=0 — fully
    # grouped reduce; forward-only programs compile in ~30 s). The
    # training default (span_pass_limit=16, chosen for vjp+scan compile
    # time) is reported alongside as ell_ms_train_default.
    adj_ell = ell_adjacency(g_re, symmetric=True, span_pass_limit=0)
    t_ell = bench_spmm(lambda a, xx: spmm_ell(a, xx), adj_ell, x0,
                       overhead, rounds=5)
    adj_ell_train = ell_adjacency(g_re, symmetric=True)
    t_ell_train = bench_spmm(lambda a, xx: spmm_ell(a, xx), adj_ell_train,
                             x0, overhead)
    adj_coo = coo_adjacency(g_re, symmetric=True)
    t_coo = bench_spmm(lambda a, xx: spmm(a, xx), adj_coo, x0, overhead,
                       inner=5)

    # in-situ roofline: chained stride-sum gather at the kernel's table
    # shape — the data-movement floor of one SpMM (see module docstring)
    ns_slot = _gather_ns_per_row(n, k, rounds=5)
    slots = int(adj_ell.cols.size)
    roofline_ms = slots * ns_slot * 1e-6
    roofline_pct = 100.0 * roofline_ms / (t_ell * 1e3)

    # full training step (fwd + bwd + adam): generic (4 SpMM/iter) and
    # with the layer-1 hoisting the models apply by default (2 SpMM/iter).
    # Detail-only: never allowed to sink the primary metric — skipped with
    # -1 sentinels on error or when the wall-clock budget is spent.
    # Gating (cold-cache safe): the first detail step starts only with
    # >=150 s of budget left (a cold vjp+scan compile is ~85-105 s plus
    # the run; a warm one far less). The second gates on the MEASURED
    # wall cost of the first — on a cold relay cache both compiles cost
    # minutes, and an elapsed-only check could start the second at
    # t=budget-1 and blow the driver window. Worst case end-to-end:
    # gate-1 passes at budget-151, step 1 runs ~200 s cold -> final
    # print by ~budget+200 s, inside the driver window with margin.
    try:
        t1_wall = time.time() - _T0
        t_step = (bench_train_step(adj_ell_train, data, overhead)
                  if t1_wall < _DETAIL_BUDGET_S - 150.0 else -1.0)
        step1_cost = time.time() - _T0 - t1_wall
        if (t_step > 0
                and time.time() - _T0 + step1_cost < _DETAIL_BUDGET_S):
            ax = jnp.asarray(spmm_ell(adj_ell_train,
                                      jnp.asarray(data.features)))
            t_step_hoisted = bench_train_step(adj_ell_train, data,
                                              overhead, feats_ax=ax)
        else:
            t_step_hoisted = -1.0
    except Exception:
        t_step = t_step_hoisted = -1.0  # sentinel: detail bench failed

    edges_per_s = e / t_ell
    print(json.dumps({
        "metric": "spmm_edges_per_s_arxiv_k32",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(t_coo / t_ell, 3),
        "detail": {
            "ell_ms": round(t_ell * 1e3, 3),
            "ell_ms_train_default": round(t_ell_train * 1e3, 3),
            "coo_baseline_ms": round(t_coo * 1e3, 3),
            "roofline_ms": round(roofline_ms, 3),
            "roofline_pct": round(roofline_pct, 1),
            "roofline_ns_per_slot": round(ns_slot, 3),
            "slots": slots,
            "train_step_ms": round(t_step * 1e3, 3) if t_step > 0 else -1,
            "train_step_hoisted_ms": (round(t_step_hoisted * 1e3, 3)
                                      if t_step_hoisted > 0 else -1),
            "n": n, "nnz": e, "k": k,
            "pad_fraction": round(adj_ell.pad_fraction, 4),
        },
    }))


def _gather_ns_per_row(n, k, rounds=3):
    """ns per gathered row from an (n, k) f32 table — delegates to THE
    protocol implementation (examples/bench_gather.py::
    bench_chained_gather) so the in-bench roofline and the committed
    microbenchmark can never diverge."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "bench_gather.py")
    spec = importlib.util.spec_from_file_location("bench_gather", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.bench_chained_gather(n, k, jnp.float32, rounds=rounds)


def bench_train_step(adj, data, overhead, inner=10, rounds=3,
                     feats_ax=None, nhid=32):
    """Full GCN train step (fwd+bwd+adam, hidden=nhid) per-iter seconds.

    feats_ax: precomputed A@X -> layer 1 becomes a plain matmul (the
    hoisted configuration the models run by default)."""
    import jax
    import optax

    from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
    from gcn_tpu.train.metrics import masked_nll
    from gcn_tpu.train.optim import adam_l2

    # layer 2 contracts (A h) W so its SpMM runs at k=nhid (the models'
    # auto_order choice; nclass=40 would chunk at k_pad=32)
    orders = ("a_xw", "ax_w") if feats_ax is None else ("xw", "ax_w")
    feats = jnp.asarray(data.features) if feats_ax is None else feats_ax
    labels = jnp.asarray(data.labels)
    idx = jnp.asarray(np.asarray(data.idx_train), dtype=jnp.int32)
    params = init_gcn_params(jax.random.PRNGKey(0), data.num_features,
                             nhid, data.num_classes)
    tx = adam_l2(0.01, 5e-4)
    opt0 = tx.init(params)

    def step(carry, _):
        p, o = carry

        def loss_fn(pp):
            lp = gcn_forward(pp, feats, adj, orders=orders,
                             dropout_rate=0.0, train=False)
            return masked_nll(lp, labels, idx)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    @jax.jit
    def run(p, o):
        (p, o), losses = jax.lax.scan(step, (p, o), None, length=inner)
        return losses.sum()

    float(run(params, opt0))  # compile + warm
    best = 1e9
    for r in range(rounds):
        p2 = jax.tree_util.tree_map(lambda a: a * (1 + r * 1e-3), params)
        t0 = time.perf_counter()
        float(run(p2, opt0))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best


if __name__ == "__main__":
    main()
