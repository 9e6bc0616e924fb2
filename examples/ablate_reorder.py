#!/usr/bin/env python
"""Reorder ablation — the locality study the reference exists to run
(order_*.cu + run.sh sweeps; SURVEY.md §7 step 9), re-posed for TPU.

On a GPU the vertex order buys gather locality inside the SpMM. Measured
on TPU v5e the XLA gather is locality-insensitive (tile/ell.py), so the
order matters through two different channels instead:

  * ELL fill — degree-homogeneous windows (the degree sort composed into
    the v6 pipeline) cut slot padding and hence gather work;
  * multi-chip boundary — community clustering (Rabbit) shrinks the
    halo exchanged over ICI.

This tool reports, per reorder method (x degree-sort on/off): ELL pad
fraction, single-chip SpMM ms (on the current backend), row-band boundary
fraction, and halo exchange fraction at --shards shards.

    python examples/ablate_reorder.py -g synth-pubmed --shards 8
"""

import argparse
import json
import sys
import time


def measure(g, method, deg_sort, shards, k):
    """deg_sort: "none" | "global" | "band" (in-band: keeps shard bands)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcn_tpu.ops.ell_spmm import spmm_ell
    from gcn_tpu.parallel import (band_degree_sort_order, build_halo_plan,
                                  build_halo_plan_ragged,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import rows_per_shard_for
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.tile import degree_sort_order, ell_adjacency

    g2, _ = reorder_graph(g, method)
    if deg_sort == "global":
        g2 = g2.permute(degree_sort_order(g2))
    elif deg_sort == "band":
        g2 = g2.permute(band_degree_sort_order(
            g2, rows_per_shard_for(g2.shape[0], shards)))
    adj = ell_adjacency(g2, symmetric=True)
    sg = shard_graph_by_rows(g2, shards)
    plan = build_halo_plan(sg)
    plan_ragged = build_halo_plan_ragged(sg)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g2.shape[0], k)).astype(np.float32) * 0.01)
    run = jax.jit(lambda a, xx: jnp.sum(jax.lax.fori_loop(
        0, 10, lambda i, acc: spmm_ell(a, acc) * 0.999 + xx * 1e-6, xx)))
    float(run(adj, x * 0.5))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        float(run(adj, x * (1 + r * 1e-3)))
        best = min(best, (time.perf_counter() - t0) / 10)
    return {
        "method": method + {"none": "", "global": "+degsort",
                            "band": "+band-degsort"}[deg_sort],
        "pad_fraction": round(adj.pad_fraction, 4),
        "spmm_ms": round(best * 1e3, 3),
        "boundary_fraction": round(sg.boundary_fraction(), 4),
        "halo_exchange_fraction": round(plan_ragged.exchange_fraction, 4),
        "halo_exchange_fraction_padded": round(plan.exchange_fraction, 4),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-g", "--graph", default="synth-pubmed")
    ap.add_argument("-k", "--width", type=int, default=32)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--methods", nargs="*",
                    default=["identity", "degree", "rcm", "gorder",
                             "gorder3", "rabbit"])
    args = ap.parse_args()

    import jax

    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize

    data = get_dataset(args.graph)
    g = gcn_normalize(data.adj)
    print(f"[{args.graph}] n={g.shape[0]} nnz={g.nnz} "
          f"backend={jax.default_backend()}")
    rows = []
    for method in args.methods:
        for deg_sort in ("none", "global", "band"):
            if deg_sort != "none" and method in ("identity", "degree"):
                continue  # composed permutation identical to plain degree
            r = measure(g, method, deg_sort, args.shards, args.width)
            rows.append(r)
            print(json.dumps(r), flush=True)
    # summary: best by each criterion
    best_fill = min(rows, key=lambda r: r["pad_fraction"])
    best_halo = min(rows, key=lambda r: r["halo_exchange_fraction"])
    print(f"\nbest fill: {best_fill['method']} "
          f"(pad {best_fill['pad_fraction']}); "
          f"best halo: {best_halo['method']} "
          f"(exchange {best_halo['halo_exchange_fraction']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
