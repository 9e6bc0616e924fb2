"""Frequency-split table benchmark — the >1M-row gather regime.

Measures, on the real chip, the chained SpMM rate of:
  * the single-table packed path (what ``ell_adjacency`` + adaptive q
    ships today — q saturates at 4 at amazon scale, ~10 ns/slot f32);
  * the frequency-split two-table path (``ell_adjacency_freq``): hot
    column-prefix resident at q=1, packed cold tail (tile/freq_split.py).

Both run the chained-feedback protocol of bench.py (fresh inputs, scalar
readback, no-op roundtrip subtracted — see bench.py's module docstring
for why anything else misleads on this backend). Writes
results/freq_split_<graph>.json, the committed decision-point artifact
the FreqSplitAdj docstring cites.

Reference counterpart: the row-skew motif that motivates the split is
the reference's row_analysis/ study (SURVEY.md §2b); the reference never
ran at this scale on one GPU — this is a beyond-reference capability.
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_bench = _load("_root_bench", os.path.join(_HERE, os.pardir, "bench.py"))


def main():
    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.ops.ell_spmm import _TABLE_BUDGET_BYTES, _pack_q, spmm_ell
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.tile import (degree_sort_order, ell_adjacency,
                              ell_adjacency_freq, spmm_ell_freq)

    ap = argparse.ArgumentParser()
    ap.add_argument("-g", default="synth-amazon")
    ap.add_argument("-k", type=int, default=32)
    ap.add_argument("--f32", action="store_true",
                    help="f32 gather tables (default bf16 — the shipped "
                         "big-graph configuration)")
    ap.add_argument("--skip-single", action="store_true",
                    help="skip the single-table baseline (halves device "
                         "upload time when only the split rate is needed)")
    ap.add_argument("--order-sweep", action="store_true",
                    help="HOST-ONLY: sweep part-aware global row orders "
                         "and print paper costs (slot counts x measured "
                         "ns/slot); no device work (VERDICT r3 #5)")
    ap.add_argument("--part-order", action="store_true",
                    help="apply the within-segment cold-degree order "
                         "(tile.freq_split.freq_split_order) before the "
                         "split — the sweep's 1.29x-on-paper winner")
    ap.add_argument("-o", default=None)
    args = ap.parse_args()
    bf16 = not args.f32
    if args.order_sweep:
        return order_sweep(args, bf16)

    t0 = time.time()
    data = get_dataset(args.g, seed=0)
    g = gcn_normalize(data.adj)
    g, _ = reorder_graph(g, "rabbit")
    g = g.permute(degree_sort_order(g))
    n, e = g.shape[0], g.nnz
    print(f"{args.g}: n={n} nnz={e}  (preprocess {time.time() - t0:.1f}s)",
          flush=True)

    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((n, args.k)).astype(np.float32) * .01)
    overhead = _bench._sync_overhead(x0)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    out = {"graph": args.g, "n": n, "nnz": e, "k": args.k,
           "table_dtype": "bf16" if bf16 else "f32",
           "budget_mb": _TABLE_BUDGET_BYTES // 2**20}

    if not args.skip_single:
        t0 = time.time()
        adj = ell_adjacency(g, symmetric=True, table_bf16=bf16,
                            span_pass_limit=0)
        q1 = _pack_q(n, 32, dt)
        t_s = _bench.bench_spmm(spmm_ell, adj, x0, overhead, inner=10)
        out["single"] = {
            "q": q1, "ms": round(t_s * 1e3, 2),
            "ns_per_slot": round(t_s * 1e9 / adj.cols.size, 2),
            "slots": int(adj.cols.size),
            "pad_fraction": round(adj.pad_fraction, 4)}
        print(f"single-table q={q1}: {t_s*1e3:.2f} ms "
              f"({out['single']['ns_per_slot']} ns/slot; build+upload "
              f"{time.time() - t0:.0f}s)", flush=True)
        del adj

    t0 = time.time()
    g_split = g
    if args.part_order:
        from gcn_tpu.tile.freq_split import freq_split_order

        po = freq_split_order(g, table_bf16=bf16)
        if po is not None:
            g_split = g.permute(po)
        out["part_order"] = po is not None
    fs = ell_adjacency_freq(g_split, table_bf16=bf16, span_pass_limit=0)
    q_cold = (_pack_q(n - fs.hot_rows, 32, dt) if fs.cold is not None
              else 0)
    t_f = _bench.bench_spmm(spmm_ell_freq, fs, x0, overhead, inner=10)
    slots = int(fs.hot.cols.size
                + (fs.cold.cols.size if fs.cold is not None else 0))
    out["freq_split"] = {
        "hot_rows": fs.hot_rows, "q_cold": q_cold,
        "hot_edge_fraction": round(fs.hot_edge_fraction, 4),
        "ms": round(t_f * 1e3, 2),
        "ns_per_slot": round(t_f * 1e9 / slots, 2), "slots": slots,
        "pad_fraction": round(
            (fs.hot.pad_fraction * fs.hot.cols.size
             + fs.cold.pad_fraction * fs.cold.cols.size) / slots, 4)}
    out["edges_per_s_freq"] = round(e / t_f, 1)
    print(f"freq-split hot={fs.hot_rows} (edge frac "
          f"{fs.hot_edge_fraction:.2f}) q_cold={q_cold}: {t_f*1e3:.2f} ms "
          f"({out['freq_split']['ns_per_slot']} ns/slot; build+upload "
          f"{time.time() - t0:.0f}s)", flush=True)
    if "single" in out:
        out["speedup"] = round(out["single"]["ms"]
                               / out["freq_split"]["ms"], 3)
        print(f"speedup: {out['speedup']}x", flush=True)

    path = args.o or os.path.join(
        _HERE, os.pardir, "results",
        f"freq_split_{args.g.replace('synth-', '')}.json")
    from gcn_tpu.utils.artifacts import write_artifact
    write_artifact(path, out, harness="examples/bench_freq_split.py",
                   schema="freq_split_v2", allow=["speedup"])
    print(f"wrote {path}")


def order_sweep(args, bf16):
    """Host-side sweep of part-aware global row orders (VERDICT r3 #5).

    The round-3 idea: weight the global row order by COLD-part degree so
    the expensive packed cold table gets homogeneous windows, shifting
    padding into the cheap unpacked hot table. Constraint discovered
    here: the order must permute rows and columns TOGETHER (the split
    slices x[:H], so an asymmetric row-only sort needs the ~51 ms n-row
    un-permute the round-3 sweep already refuted) and must keep the hot
    SET fixed as the prefix — so only within-segment reorderings are
    admissible. Each candidate's slot counts are exact (the real tiler
    runs); the time conversion weights them with the committed
    artifact's measured per-part ns/slot. A TPU run is spent only if a
    candidate beats the shipped order by >=1.15x on paper.
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.tile import degree_sort_order, ell_adjacency_freq
    from gcn_tpu.tile.freq_split import default_hot_rows

    t0 = time.time()
    data = get_dataset(args.g, seed=0)
    g = gcn_normalize(data.adj)
    g, _ = reorder_graph(g, "rabbit")
    g = g.permute(degree_sort_order(g))
    n = g.shape[0]
    h_rows = default_hot_rows(n, bf16)
    if h_rows >= n:
        print(f"{args.g}: table fits residency (n={n}) — nothing to split")
        return 0
    print(f"{args.g}: n={n} nnz={g.nnz} H={h_rows} "
          f"(preprocess {time.time()-t0:.0f}s)", flush=True)

    rows_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
    mask = g.indices < h_rows
    hot_deg = np.bincount(rows_of[mask], minlength=n)
    cold_deg = np.bincount(rows_of[~mask], minlength=n)

    def seg_order(key_pre, key_tail):
        pre = np.argsort(-key_pre[:h_rows], kind="stable")
        tail = h_rows + np.argsort(-key_tail[h_rows:], kind="stable")
        return np.concatenate([pre, tail])

    total = hot_deg + cold_deg
    candidates = {
        "shipped (global degree)": None,
        "cold-degree within segments": seg_order(cold_deg, cold_deg),
        "hot-degree within segments": seg_order(hot_deg, hot_deg),
        "cold-degree tail only": np.concatenate(
            [np.arange(h_rows),
             h_rows + np.argsort(-cold_deg[h_rows:], kind="stable")]),
        "hot-prefix by hot, tail by cold": seg_order(hot_deg, cold_deg),
    }
    del total

    # measured per-part ns/slot (RESULTS_r3 H-sweep: hot 3.68 / cold
    # 7.24 at H=envelope/2 on this graph, chained protocol)
    hot_ns, cold_ns = 3.68, 7.24
    print(f"paper rates: hot {hot_ns} / cold {cold_ns} ns/slot "
          f"(RESULTS_r3 measured)", flush=True)

    table = []
    for name, order in candidates.items():
        g2 = g if order is None else g.permute(order)
        fs = ell_adjacency_freq(g2, table_bf16=bf16, span_pass_limit=0,
                                hot_rows=h_rows)
        hs = int(fs.hot.cols.size)
        cs = int(fs.cold.cols.size) if fs.cold is not None else 0
        paper_ms = (hs * hot_ns + cs * cold_ns) * 1e-6
        table.append({"order": name, "hot_slots": hs, "cold_slots": cs,
                      "hot_pad": round(fs.hot.pad_fraction, 4),
                      "cold_pad": round(fs.cold.pad_fraction, 4),
                      "paper_ms": round(paper_ms, 1)})
        print(json.dumps(table[-1]), flush=True)

    base = table[0]["paper_ms"]
    best = min(table, key=lambda r: r["paper_ms"])
    print(f"\nbest: '{best['order']}' paper {best['paper_ms']} ms vs "
          f"shipped {base} ms -> {base / best['paper_ms']:.3f}x "
          f"({'spend a TPU run' if base / best['paper_ms'] >= 1.15 else 'below the 1.15x bar — ceiling closed'})")
    if args.o:
        from gcn_tpu.utils.artifacts import write_artifact
        write_artifact(args.o, {"graph": args.g, "h_rows": h_rows,
                                "paper_rates_ns": [hot_ns, cold_ns],
                                "rows": table},
                       harness="examples/bench_freq_split.py --order-sweep",
                       schema="freq_split_order_sweep_v1")
        print(f"wrote {args.o}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
