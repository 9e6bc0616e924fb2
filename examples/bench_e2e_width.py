"""Realistic-width end-to-end table: arxiv-scale GCN at hidden 64/128.

The reference's run.sh sweeps hidden=4 (run.sh:3-9) — useful for kernel
profiling, weak evidence that the pipeline *trains*. This harness runs
the widths people actually use (64, 128) for the auto-order (v4) and
full-pipeline (v6) variants on the synth-arxiv stand-in and commits
test accuracy, warm ms/iter, and cold-compile time to
``results/e2e_width_arxiv.json``.

Timing protocol (axon-relay honest): each config is fit TWICE with
different seeds — same shapes, so the second run hits the relay's
cross-process compile cache, but fresh parameter values, so the
execution itself cannot be served from the relay's result cache. The
scanned training loop is one device dispatch; its device-fenced time is
``timers("fit_scan").d``. warm ms/iter = warm scan / iters; compile s =
(cold - warm) scan time. Accuracy is reported from the cold (seed 15,
the reference's seed, profiling_gcn.py:76-80) run.

Usage: python examples/bench_e2e_width.py [-g synth-arxiv] [-i 200]
"""

import argparse
import json
import os
import time


def run_config(data, variant, hidden, iters, seed):
    from gcn_tpu.models import GCN

    model = GCN(data.num_features, hidden, data.num_classes,
                variant=variant, seed=seed)
    t0 = time.time()
    model.fit(data.features, data.adj, data.labels, data.idx_train,
              train_iters=iters, verbose=False)
    wall_s = time.time() - t0
    scan_ms = model.timers("fit_scan").d.total_ms
    acc = model.test(data.idx_test, verbose=False)
    return {"acc": float(acc), "scan_ms": scan_ms, "wall_s": wall_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-g", "--graph", default="synth-arxiv")
    ap.add_argument("-i", "--train-iters", type=int, default=200)
    ap.add_argument("--variants", default="v4,v6")
    ap.add_argument("--hiddens", default="64,128")
    ap.add_argument("-o", "--out",
                    default=os.path.join(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                        "results", "e2e_width_arxiv.json"))
    args = ap.parse_args()

    import jax

    from gcn_tpu.data import get_dataset

    print(f"jax devices: {jax.devices()}")
    data = get_dataset(args.graph, seed=0)
    print(f"[{args.graph}] n={data.num_nodes} nnz={data.adj.nnz} "
          f"f={data.num_features} classes={data.num_classes}")

    rows = []
    for variant in args.variants.split(","):
        for hidden in (int(h) for h in args.hiddens.split(",")):
            cold = run_config(data, variant, hidden, args.train_iters,
                              seed=15)
            warm = run_config(data, variant, hidden, args.train_iters,
                              seed=16)
            row = {
                "graph": args.graph, "variant": variant, "hidden": hidden,
                "iters": args.train_iters,
                "acc_test": round(cold["acc"], 4),
                "acc_test_seed16": round(warm["acc"], 4),
                "warm_ms_iter": round(warm["scan_ms"] / args.train_iters,
                                      3),
                "compile_s": round(
                    (cold["scan_ms"] - warm["scan_ms"]) / 1e3, 1),
                "cold_scan_s": round(cold["scan_ms"] / 1e3, 1),
                "cold_wall_s": round(cold["wall_s"], 1),
            }
            rows.append(row)
            print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"protocol": "two fits per config (seeds 15/16): warm "
                               "= second scan (relay compile-cache hit, "
                               "fresh values); compile = cold - warm",
                   "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")

    print(f"\n| variant | hidden | acc | warm ms/iter | compile s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['hidden']} | {r['acc_test']:.4f} "
              f"| {r['warm_ms_iter']:.1f} | {r['compile_s']:.0f} |")


if __name__ == "__main__":
    main()
