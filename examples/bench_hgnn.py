"""HGNN TPU perf artifact — the reference's second model family, timed.

The reference prints cumulative fwd/bwd/layer/gemm/spgemm times per
training run (pyhgnn/train.py:119-124) but records none. This harness
commits the TPU-measured equivalents on a ModelNet40-scale synthetic
hypergraph (n=12,311 objects, 2048-d visual features, KNN-10 incidence —
the reference workload's exact shape, config.yaml:28-29/14) for BOTH
G formulations:

  * dense   — G = DV^-1/2 H W DE^-1 H^T DV^-1/2 materialized once
              (hypergraph_utils.py:97-125 math), lowered to the packed
              ELL kernel; ~K^2 nnz/row
  * factored — TwoHopAdj(A1, A2) with G = A1 @ A2 never materialized
              (graph/hypergraph.generate_G_factors): two ~K-nnz/row
              SpMMs per application — the scalable formulation

Metrics per path (axon-relay honest, bench.py chained protocol: the
whole epoch loop inside one jit via lax.scan, fresh params per round,
scalar readback, no-op roundtrip subtracted):

  epoch_ms       full train epoch (fwd+bwd+Adam+MultiStepLR), the
                 models' default hoisted-layer-1 configuration
  epoch_2spmm_ms same with layer 1 un-hoisted (G applied twice per fwd
                 like the reference's HGNN_conv) — reference-comparable
  fwd_ms         forward only (the reference's `fwd` timer analogue)
  spmm_ms        one standalone G @ h application at k=n_hid (the
                 `spgemm` analogue; `gemm` = epoch - spmm share)

Usage: python examples/bench_hgnn.py          (real TPU, ~10 min incl.
       feature upload at relay speed)
"""

import argparse
import importlib.util
import json
import os
import time


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def bench_epoch(bench, adj, x, labels, idx_train, n_hid, n_class,
                overhead, hoisted=True, inner=10, rounds=3):
    """Chained-scan HGNN train epoch; returns best s/epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    from gcn_tpu.models.hgnn import (cross_entropy, hgnn_forward,
                                     init_hgnn_params)
    from gcn_tpu.ops.spmm import _jit_spmm, hoist_spmm

    in_ch = x.shape[1]
    params = init_hgnn_params(jax.random.PRNGKey(0), in_ch, n_hid, n_class)
    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.scale_by_adam(),
                     optax.scale_by_learning_rate(1e-3))
    opt0 = tx.init(params)
    gx = hoist_spmm(adj, x) if hoisted else None
    rs = (_jit_spmm(adj, jnp.ones((x.shape[0], 1), jnp.float32))[:, 0]
          if hoisted else None)

    def step(carry, _):
        p, o, r = carry
        r, rr = jax.random.split(r)

        def loss_fn(pp):
            logits = hgnn_forward(pp, x, adj, dropout=0.5, train=True,
                                  rng=rr, gx=gx, g_rowsum=rs)
            return cross_entropy(logits, labels, idx_train)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o, r), loss

    @jax.jit
    def run(p, o):
        (_, _, _), losses = jax.lax.scan(
            step, (p, o, jax.random.PRNGKey(1)), None, length=inner)
        return losses.sum()

    float(run(params, opt0))  # compile + warm
    best = 1e9
    for r in range(rounds):
        p2 = jax.tree_util.tree_map(lambda a: a * (1 + r * 1e-3), params)
        t0 = time.perf_counter()
        float(run(p2, opt0))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best


def bench_fwd(bench, adj, x, n_hid, n_class, overhead, inner=10):
    """Forward-only (eval) per-iter seconds, chained."""
    import jax
    import jax.numpy as jnp

    from gcn_tpu.models.hgnn import hgnn_forward, init_hgnn_params

    params = init_hgnn_params(jax.random.PRNGKey(0), x.shape[1], n_hid,
                              n_class)

    @jax.jit
    def run(p, xx):
        def it(i, acc):
            logits = hgnn_forward(p, acc, adj, train=False)
            # fold logits back into the carry so no iteration is elided
            return acc * 0.999 + jnp.pad(
                logits, ((0, 0), (0, acc.shape[1] - logits.shape[1]))
            ) * 1e-6

        return jnp.sum(jax.lax.fori_loop(0, inner, it, xx))

    float(run(params, x * 0.5))
    best = 1e9
    for r in range(1, 4):
        t0 = time.perf_counter()
        float(run(params, x * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0 - overhead) / inner)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12311,
                    help="ModelNet40 object count (config.yaml:28)")
    ap.add_argument("--f", type=int, default=2048)
    ap.add_argument("--nhid", type=int, default=128)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--k-neigs", type=int, default=10)
    ap.add_argument("--paths", default="dense,factored")
    ap.add_argument("-o", "--out",
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), "results",
                        "hgnn_bench.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_tpu.graph.hypergraph import (construct_H_with_KNN,
                                          generate_G_factors,
                                          generate_G_from_H)
    from gcn_tpu.models.hgnn import HGNN
    from gcn_tpu.ops.spmm import TwoHopAdj, _jit_spmm

    sys_path = os.path.dirname(os.path.abspath(__file__))
    import sys
    sys.path.insert(0, sys_path)
    from train_hgnn import synthetic_visual_features

    bench = _load_bench()
    print(f"jax devices: {jax.devices()}")
    t0 = time.time()
    fts, labels, idx_train, _ = synthetic_visual_features(
        n=args.n, f=args.f, classes=args.classes, seed=0)
    h = construct_H_with_KNN(fts[:, :64], k_neig=args.k_neigs,
                             is_prob=True, m_prob=1.0)
    print(f"hypergraph built in {time.time()-t0:.0f}s "
          f"(n={args.n} f={args.f} K={args.k_neigs})", flush=True)

    x = jnp.asarray(fts)
    yl = jnp.asarray(labels)
    idx = jnp.asarray(idx_train.astype(np.int32))
    overhead = bench._sync_overhead(x[:256, :32])

    lowerer = HGNN(args.f, args.classes, n_hid=args.nhid)
    rows = {}
    for path in args.paths.split(","):
        t0 = time.time()
        if path == "dense":
            g_csr = generate_G_from_H(h)   # materialized chain -> CSR
            adj = lowerer._lower(g_csr)
            nnz = g_csr.nnz
        else:
            a1, a2 = generate_G_factors(h)
            adj = TwoHopAdj(lowerer._lower(a1), lowerer._lower(a2))
            nnz = a1.nnz + a2.nnz
        build_s = time.time() - t0
        print(f"[{path}] nnz={nnz} built in {build_s:.0f}s", flush=True)

        t_sp = bench.bench_spmm(
            lambda a, xx: _jit_spmm(a, xx),
            adj,
            jnp.asarray(np.random.default_rng(0).standard_normal(
                (args.n, args.nhid)).astype(np.float32) * 0.01),
            overhead, inner=10)
        t_fwd = bench_fwd(bench, adj, x, args.nhid, args.classes, overhead)
        t_ep = bench_epoch(bench, adj, x, yl, idx, args.nhid,
                           args.classes, overhead, hoisted=True)
        t_ep2 = bench_epoch(bench, adj, x, yl, idx, args.nhid,
                            args.classes, overhead, hoisted=False)
        rows[path] = {
            "nnz": int(nnz), "build_s": round(build_s, 1),
            "spmm_ms": round(t_sp * 1e3, 3),
            "fwd_ms": round(t_fwd * 1e3, 3),
            "epoch_ms": round(t_ep * 1e3, 3),
            "epoch_2spmm_ms": round(t_ep2 * 1e3, 3),
        }
        print(json.dumps({path: rows[path]}), flush=True)

    out = {
        "workload": {"n": args.n, "f": args.f, "n_hid": args.nhid,
                     "classes": args.classes, "k_neigs": args.k_neigs,
                     "note": "ModelNet40-shape synthetic "
                             "(config.yaml:28, no egress)"},
        "protocol": "bench.py chained protocol: epoch loop inside one "
                    "jit lax.scan, fresh params per round, scalar "
                    "readback, min of 3, no-op roundtrip subtracted; "
                    "epoch_ms = default hoisted layer 1, "
                    "epoch_2spmm_ms = reference HGNN_conv form "
                    "(G applied in both layers)",
        "paths": rows,
    }
    if "dense" in rows and "factored" in rows:
        out["factored_over_dense_spmm"] = round(
            rows["factored"]["spmm_ms"] / rows["dense"]["spmm_ms"], 3)
    from gcn_tpu.utils.artifacts import write_artifact
    write_artifact(args.out, out, harness="examples/bench_hgnn.py",
                   schema="hgnn_bench_v1",
                   allow=["factored_over_dense_spmm"])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
