#!/usr/bin/env python
"""Distributed (multi-chip) GCN training driver.

The multi-chip counterpart of examples/train_gcn.py: full-batch 2-layer
GCN with the graph row-banded across a device mesh, trained through
gcn_tpu.parallel.make_sharded_gcn_train_step (boundary-only halo
exchange, fused boundary-rows-first overlap, optional bf16 wire). The
single-GPU reference has no distributed mode (SURVEY.md §5); this driver
is the beyond-reference capability surfaced as a CLI.

    # 8 fake CPU devices (what tests/conftest.py uses)
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python examples/train_gcn_dist.py -g synth-pubmed -k 16 -i 60

    # hierarchical host x chip exchange + bf16 wire
    ... train_gcn_dist.py -g synth-arxiv --exchange halo_hier \\
        --hier 2 4 --halo-bf16

On a real pod slice the mesh spans actual chips and the exchange rides
ICI/DCN. Do NOT time this through the single-chip axon relay: shard_map
dispatch there costs seconds (CLAUDE.md); per-step timing is only
meaningful with the devices local.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(
        description="Distributed full-batch GCN training over a device mesh")
    ap.add_argument("-g", "--graph", default="synth-pubmed")
    ap.add_argument("-k", "--hidden", type=int, default=16)
    ap.add_argument("-i", "--train-iters", type=int, default=100)
    ap.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all visible devices)")
    ap.add_argument("--exchange", default="halo",
                    choices=["halo", "halo_padded", "halo_hier",
                             "all_gather"])
    ap.add_argument("--hier", type=int, nargs=2, metavar=("HOSTS", "CHIPS"),
                    default=None,
                    help="host x chip factorization for --exchange "
                         "halo_hier (default: 2 x devices/2)")
    ap.add_argument("--halo-bf16", action="store_true",
                    help="exchange_dtype='bf16': bf16 payload on the wire "
                         "(forward AND the transposed collectives in "
                         "backward), cast back on arrival")
    ap.add_argument("--halo-wire", default=None,
                    choices=["f32", "bf16", "fp8", "auto"],
                    help="wire dtype for the halo exchange payload: bf16 "
                         "halves bytes, fp8 (float8_e4m3fn, clipped) "
                         "quarters them — for the DCN-byte-bound "
                         "pod-scale regime. 'auto' applies "
                         "projection.recommend_wire_dtype on this run's "
                         "exact plan volumes (bf16 unless the hier plan "
                         "is DCN-byte-bound and fp8 closes the gap). "
                         "Overrides --halo-bf16.")
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the fused interior/boundary overlap "
                         "(ablation)")
    ap.add_argument("--reorder", default="rabbit",
                    help="identity|degree|dfs|rcm|gorder|gorder3|rabbit "
                         "(rabbit minimizes the halo; in-band degree sort "
                         "is composed automatically)")
    ap.add_argument("--exchange-chunk", type=int, default=32,
                    help="k-chunk the exchange + boundary aggregation at "
                         "layer widths past this (0 = monolithic; "
                         "docs/RESULTS_r4.md)")
    ap.add_argument("--k-pad", type=int, default=0, choices=[0, 8, 16, 32, 64, 128],
                    help="ELL slot width for the per-shard kernels "
                         "(0 = auto: widest SpMM operand, capped at 128 "
                         "— one gather pass for wide hidden layers, "
                         "results/kpad_sweep.json)")
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=15)
    ap.add_argument("--save-state", default=None, metavar="PATH",
                    help="write the full resumable training state "
                         "(params + optimizer + iteration) after the run")
    ap.add_argument("--resume-state", default=None, metavar="PATH",
                    help="continue from a --save-state checkpoint; the "
                         "per-iteration fold_in rng stream makes "
                         "resume == uninterrupted exactly")
    args = ap.parse_args()

    import jax

    from gcn_tpu.data import get_dataset
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import init_gcn_params
    from gcn_tpu.parallel import (band_degree_sort_order, create_mesh,
                                  create_mesh_hier,
                                  make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows, rows_per_shard_for
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.train.optim import adam_l2

    avail = len(jax.devices())
    d = args.devices or avail
    if d > avail:
        sys.exit(f"--devices {d} > {avail} visible devices")

    t0 = time.time()
    data = get_dataset(args.graph, seed=args.seed)
    g = gcn_normalize(data.adj)
    x, labels = data.features, data.labels
    n = data.num_nodes
    mask_tr = np.zeros(n, np.float32)
    mask_tr[np.asarray(data.idx_train)] = 1.0
    mask_te = np.zeros(n, bool)
    mask_te[np.asarray(data.idx_test)] = True
    print(f"[{args.graph}] n={n} nnz={g.nnz} f={data.num_features} "
          f"classes={data.num_classes} (loaded {time.time()-t0:.2f}s)")

    # reorder for halo locality, then in-band degree sort for ELL fill
    # (the multi-chip composition rule, CLAUDE.md / ablate_reorder.py)
    t0 = time.time()
    if args.reorder and args.reorder != "identity":
        g, perm = reorder_graph(g, args.reorder)
        x, labels = x[perm], labels[perm]
        mask_tr, mask_te = mask_tr[perm], mask_te[perm]
    bperm = band_degree_sort_order(g, rows_per_shard_for(n, d))
    g, x, labels = g.permute(bperm), x[bperm], labels[bperm]
    mask_tr, mask_te = mask_tr[bperm], mask_te[bperm]
    sg = shard_graph_by_rows(g, d)
    print(f"reorder+shard: {time.time()-t0:.2f}s, {d} bands of "
          f"{sg.rows_per_shard} rows")

    if args.exchange == "halo_hier":
        nh, nc = args.hier or (2, d // 2)
        if nh * nc != d:
            sys.exit(f"--hier {nh} {nc} does not factor devices={d}")
        mesh = create_mesh_hier(nh, nc)
    else:
        mesh = create_mesh(d)

    tx = adam_l2(args.lr, args.weight_decay)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=args.dropout, exchange=args.exchange,
        overlap=not args.no_overlap,
        exchange_dtype=(
            {"f32": None, "bf16": "bf16", "fp8": "fp8",
             "auto": "auto"}[args.halo_wire]
            if args.halo_wire else ("bf16" if args.halo_bf16 else None)),
        widths=(data.num_features, args.hidden, data.num_classes),
        exchange_chunk=args.exchange_chunk or None,
        k_pad=args.k_pad or next(
            k for k in (32, 64, 128)
            if k >= min(max(args.hidden, data.num_classes), 128)))

    adj, xs, ys, ms = shard_fn(sg, pad_rows(x.astype(np.float32), sg),
                               pad_rows(labels, sg), pad_rows(mask_tr, sg))
    params = init_gcn_params(jax.random.PRNGKey(args.seed),
                             data.num_features, args.hidden,
                             data.num_classes)
    opt_state = tx.init(params)
    it0 = 0
    if args.resume_state:
        from gcn_tpu.utils.checkpoint import load_training_state

        params, opt_state, it0, _ = load_training_state(
            args.resume_state, params, opt_state)
        print(f"resumed from {args.resume_state} at iteration {it0}")

    plan_frac = None
    if args.exchange in ("halo", "halo_padded"):
        from gcn_tpu.parallel import build_halo_plan_ragged

        plan_frac = build_halo_plan_ragged(sg).exchange_fraction
    elif args.exchange == "halo_hier":
        from gcn_tpu.parallel import build_halo_plan_hier

        plan_frac = build_halo_plan_hier(sg, nh, nc).exchange_fraction
    t0 = time.time()
    losses = []
    for i in range(it0, it0 + args.train_iters):
        # per-iteration fold_in: the rng at iteration i is a pure
        # function of (seed, i), so resumed and uninterrupted runs use
        # identical dropout streams
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(
                jax.random.PRNGKey(args.seed + 1), i), adj, xs, ys, ms)
        if i == it0:
            jax.block_until_ready(loss)
            t_warm = time.time() - t0
            print(f"first step (compile) {t_warm:.2f}s")
            t0 = time.time()
        losses.append(float(loss))
        if i % 10 == 0:
            print(f"Epoch {i:4d}, training loss: {losses[-1]:.6f}")
    per_it = (time.time() - t0) / max(args.train_iters - 1, 1)
    print(f"fit done: {per_it*1e3:.2f} ms/iter warm "
          f"({args.train_iters} iters, final loss {losses[-1]:.4f})")
    if args.save_state:
        from gcn_tpu.utils.checkpoint import save_training_state

        save_training_state(args.save_state, jax.device_get(params),
                            jax.device_get(opt_state),
                            it0 + args.train_iters)
        print(f"saved training state to {args.save_state}")

    lp = np.asarray(eval_fn(params, adj, xs))[:n]
    pred = lp.argmax(axis=1)
    acc = float((pred[mask_te] == labels[mask_te]).mean())
    acc_tr = float((pred[mask_tr > 0] == labels[mask_tr > 0]).mean())
    print(f"Train accuracy= {acc_tr:.4f}")
    print(f"Test set results: accuracy= {acc:.4f}")
    if plan_frac is not None:
        print(f"exchange fraction: {plan_frac:.3f}")
    return acc


if __name__ == "__main__":
    main()
