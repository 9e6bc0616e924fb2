"""CLI training driver — the framework's analogue of profiling_gcn.py.

Usage:
    python examples/train_gcn.py -g synth-pubmed -k 16 -i 100 \
        --variant v4 [--reorder rabbit] [--adj coo|dense|panel|auto]

Prints loss curve, per-phase timing report, and final test accuracy —
mirroring the reference driver's CLI surface (profiling_gcn.py:85-90) and
its timing printouts (gcn6.py:401-440).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="Train a 2-layer GCN on TPU")
    ap.add_argument("-g", "--graph", default="synth-small")
    ap.add_argument("-k", "--hidden", type=int, default=16)
    ap.add_argument("-i", "--train-iters", type=int, default=100)
    ap.add_argument("--variant", default="v4",
                    choices=["v1", "v2", "v3", "v4", "v5", "v6"])
    ap.add_argument("--adj", default=None,
                    help="adjacency representation: dense|coo|ell|panel|auto")
    ap.add_argument("--reorder", default=None,
                    help="identity|degree|dfs|rcm|gorder|rabbit")
    ap.add_argument("--with-val", action="store_true")
    ap.add_argument("--seed", type=int, default=15)  # profiling_gcn.py:76-80
    ap.add_argument("--verbose", action="store_true", default=True)
    ap.add_argument("--save-path", default=None,
                    help="save trained params (npz) after fit")
    ap.add_argument("--load-path", default=None,
                    help="load params instead of training (the reference's "
                         "TEST branch, profiling_gcn.py:166-170)")
    ap.add_argument("--profile-ops", action="store_true",
                    help="after fit, print the per-op xw/af/bi timing "
                         "table (gcn6.py:404-410 equivalent)")
    ap.add_argument("--history-json", default=None,
                    help="write per-iteration loss (+val) records as JSON")
    ap.add_argument("--table-bf16", action="store_true",
                    help="bf16 gather table (f32 accumulate): no gather "
                         "residency cliff past ~200k vertices; ~1e-3 rel "
                         "error on the aggregation (tile/ell.py)")
    ap.add_argument("--products-bf16", action="store_true",
                    help="bf16 gather products on the Pallas-reduce paths")
    ap.add_argument("--freq-split", action="store_true",
                    help="frequency-split gather table (resident hot "
                         "column prefix + packed cold tail) for graphs "
                         "past the residency envelope (tile/freq_split.py; "
                         "measured win at synth-amazon scale)")
    ap.add_argument("--save-state", default=None,
                    help="after fit, save the FULL resumable training "
                         "state (params+optimizer+iteration)")
    ap.add_argument("--resume-state", default=None,
                    help="resume training from a --save-state checkpoint")
    ap.add_argument("--span-limit", type=int, default=None,
                    help="EllAdj.span_pass_limit: 0 = fully-fused serving "
                         "reduce (fastest SpMM, slow training-step "
                         "compile); default 16 balances both (tile/ell.py)")
    args = ap.parse_args()

    import jax

    from gcn_tpu.data import get_dataset
    from gcn_tpu.models import GCN
    from gcn_tpu.utils.profiling import setup_logging

    log = setup_logging()  # profiling-gcn.log, as profiling_gcn.py:18
    log.info("args: %s", vars(args))
    print(f"jax devices: {jax.devices()}")
    t0 = time.time()
    data = get_dataset(args.graph, seed=args.seed)
    print(f"[{args.graph}] n={data.num_nodes} nnz={data.adj.nnz} "
          f"f={data.num_features} classes={data.num_classes} "
          f"(loaded in {time.time()-t0:.2f}s)")

    adj_options = {}
    if args.table_bf16:
        adj_options["table_bf16"] = True
    if args.products_bf16:
        adj_options["products_bf16"] = True
    if args.freq_split:
        adj_options["freq_split"] = True
    if args.span_limit is not None:
        adj_options["span_pass_limit"] = args.span_limit
    model = GCN(
        data.num_features, args.hidden, data.num_classes,
        variant=args.variant, adj_kind=args.adj, reorder=args.reorder,
        seed=args.seed, adj_options=adj_options,
    )
    if args.load_path:
        model.load(args.load_path)
        lp = model.predict(data.features, data.adj)
        import jax.numpy as jnp

        from gcn_tpu.train.metrics import accuracy

        acc = float(accuracy(lp, jnp.asarray(data.labels),
                             jnp.asarray(np.asarray(data.idx_test),
                                         dtype=jnp.int32)))
        print(f"Loaded params: test accuracy= {acc:.4f}")
        if args.history_json:
            print("--history-json ignored with --load-path (no training ran)")
        return acc

    t0 = time.time()
    model.fit(
        data.features, data.adj, data.labels, data.idx_train,
        idx_val=data.idx_val if args.with_val else None,
        train_iters=args.train_iters, verbose=args.verbose,
        resume_from=args.resume_state,
    )
    print(f"fit done in {time.time()-t0:.2f}s "
          f"({model._iters_done} total iters)")
    if args.save_state:
        model.save_state(args.save_state)
        print(f"training state saved to {args.save_state}")
    print(model.timers.report())
    acc = model.test(data.idx_test)
    log.info("graph=%s variant=%s hidden=%d iters=%d acc=%.4f fit_s=%.2f",
             args.graph, args.variant, args.hidden, args.train_iters, acc,
             time.time() - t0)
    if args.save_path:
        model.save(args.save_path)
        print(f"saved params to {args.save_path}")
    if args.profile_ops:
        model.profile_ops()
    if args.history_json:
        import json

        with open(args.history_json, "w") as f:
            json.dump({"graph": args.graph, "variant": args.variant,
                       "hidden": args.hidden, "acc_test": acc,
                       "best_iter": model.best_iter,
                       "history": model.history}, f)
        print(f"wrote {args.history_json}")
    return acc


if __name__ == "__main__":
    sys.exit(0 if main() > 0 else 1)
