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
    ap.add_argument("-o", default=None)
    args = ap.parse_args()
    bf16 = not args.f32

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
    fs = ell_adjacency_freq(g, table_bf16=bf16, span_pass_limit=0)
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


if __name__ == "__main__":
    sys.exit(main())
