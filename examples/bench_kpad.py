"""Slot-packing (k_pad) decision sweep — committed evidence for the
wide-feature single-gather-pass configuration.

The EllAdj slot width k_pad sets P = 128 // k_pad slots per gathered
row. Narrow slots (k_pad=32, P=4) quantize every row's slot count to a
multiple of 4 (pad 0.123 on arxiv) but amortize the gather over 4 slots;
wide slots (k_pad=128, P=1) cut padding to the window-max floor (0.043
with the pass ladder, tile/ell.py::_quantize_passes) and — decisively —
process a k<=128 feature matrix in ONE gather pass where k_pad=32 must
re-gather the table per 32-column chunk. The models pick k_pad as the
widest SpMM operand (models/gcn.py::_build_adjacency), so this sweep is
the measurement behind that choice.

This closes the reference's k>32 kernel-tier question (flexspmm.cu's
`vec1_v35` generic kernel, flexspmm.cu:424-498/510-541) the TPU way:
one format knob + a measured decision surface instead of a fifth kernel.

Protocol: bench.py's chained-feedback serving SpMM (span_pass_limit=0)
on Rabbit+degree-sorted synth-arxiv; one JSON artifact via the hygiene
layer. Run on the real TPU; ~3 min warm.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-g", "--graph", default="synth-arxiv")
    ap.add_argument("--ks", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--k-pads", type=int, nargs="+", default=[32, 128])
    ap.add_argument("-o", "--out", default="results/kpad_sweep.json")
    args = ap.parse_args()

    import importlib.util
    import os

    import jax.numpy as jnp
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.ops.ell_spmm import spmm_ell
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.tile import degree_sort_order, ell_adjacency
    from gcn_tpu.utils.artifacts import write_artifact

    data = get_dataset(args.graph, seed=0)
    g = gcn_normalize(data.adj)
    g_re, _ = reorder_graph(g, "rabbit")
    g_re = g_re.permute(degree_sort_order(g_re))
    n, e = g.shape[0], g.nnz
    rng = np.random.default_rng(0)

    rows = []
    for k in args.ks:
        x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32)
                         * 0.01)
        overhead = bench._sync_overhead(x0)
        for kp in args.k_pads:
            t0 = time.time()
            adj = ell_adjacency(g_re, symmetric=True, span_pass_limit=0,
                                k_pad=kp)
            t = bench.bench_spmm(lambda a, xx: spmm_ell(a, xx), adj, x0,
                                 overhead, rounds=3)
            rows.append({
                "k": k, "k_pad": kp, "ell_ms": round(t * 1e3, 3),
                "edges_per_s": round(e / t, 1),
                "slots": int(adj.cols.size),
                "pad_fraction": round(adj.pad_fraction, 4),
                "spans": len(adj.spans),
            })
            print(f"k={k} k_pad={kp}: {t*1e3:.3f} ms "
                  f"{e/t/1e6:.1f} M edges/s slots={adj.cols.size} "
                  f"pad={adj.pad_fraction:.4f} spans={len(adj.spans)} "
                  f"wall={time.time()-t0:.0f}s", flush=True)

    write_artifact(args.out, {
        "graph": args.graph, "n": n, "nnz": e,
        "protocol": "bench.py chained-feedback serving SpMM "
                    "(span_pass_limit=0), rabbit+degree-sorted, min of 3 "
                    "rounds x 30 chained iters, scalar-readback fenced",
        "rows": rows,
    }, harness="examples/bench_kpad.py", schema="kpad_sweep_v1")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
