#!/usr/bin/env python
"""Measure the fp8 halo-wire accuracy impact end-to-end.

The fp8 wire (``exchange_dtype="fp8"``: float8_e4m3fn payload, clipped,
see ``gcn_tpu/parallel/halo.py::_prep_send``) quarters the halo-exchange
bytes — the lever for the DCN-byte-bound pod-scale regime the full-step
projection prices (docs/RESULTS_r4.md). Its cost is ~6% max per-element
relative rounding on BOUNDARY rows only (forward payloads and the
transposed gradient collectives both ride the wire). This harness
answers "what does that rounding do to training?" with a full training
comparison, not an argument:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/bench_fp8_wire.py

For each wire dtype (f32 / bf16 / fp8) and each seed, train the
flagship sharded 2-layer GCN (boundary-only halo exchange, fused
overlap — the train_gcn_dist.py pipeline) to convergence on an 8-band
mesh and record final loss + train/test accuracy. The mesh is the fake
8-device CPU mesh: wire-dtype NUMERICS are identical to a real pod
(same jnp cast/clip, same collectives), only the timing differs — and
timing is not what this artifact claims. Writes
``results/fp8_wire_eval.json`` (schema ``fp8_wire_eval_v1``).

Reference anchor: the upstream has no distributed mode at all
(SURVEY.md §5); accuracy parity there is single-GPU f32
(pygcn/train.py). The bar here is therefore internal: the fp8 wire must
match this framework's own f32-wire accuracy within noise.
"""

import argparse
import time

import numpy as np


def run_one(graph, hidden, iters, seed, wire, exchange, devices):
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

    data = get_dataset(graph, seed=seed)
    g = gcn_normalize(data.adj)
    x, labels = data.features.astype(np.float32), data.labels
    n = data.num_nodes
    mask_tr = np.zeros(n, np.float32)
    mask_tr[np.asarray(data.idx_train)] = 1.0
    mask_te = np.zeros(n, bool)
    mask_te[np.asarray(data.idx_test)] = True

    g, perm = reorder_graph(g, "rabbit")
    x, labels = x[perm], labels[perm]
    mask_tr, mask_te = mask_tr[perm], mask_te[perm]
    bperm = band_degree_sort_order(g, rows_per_shard_for(n, devices))
    g, x, labels = g.permute(bperm), x[bperm], labels[bperm]
    mask_tr, mask_te = mask_tr[bperm], mask_te[bperm]
    sg = shard_graph_by_rows(g, devices)

    if exchange == "halo_hier":
        mesh = create_mesh_hier(2, devices // 2)
    else:
        mesh = create_mesh(devices)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.5, exchange=exchange,
        exchange_dtype=wire)
    adj, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                               pad_rows(mask_tr, sg))
    params = init_gcn_params(jax.random.PRNGKey(seed),
                             data.num_features, hidden, data.num_classes)
    opt_state = tx.init(params)
    losses = []
    for i in range(iters):
        params, opt_state, loss = step(
            params, opt_state,
            jax.random.fold_in(jax.random.PRNGKey(seed + 1), i),
            adj, xs, ys, ms)
        losses.append(float(loss))
    lp = np.asarray(eval_fn(params, adj, xs))[:n]
    pred = lp.argmax(axis=1)
    return {
        "loss_final": losses[-1],
        "acc_train": float((pred[mask_tr > 0] == labels[mask_tr > 0]).mean()),
        "acc_test": float((pred[mask_te] == labels[mask_te]).mean()),
        "finite": bool(np.all(np.isfinite(losses))),
    }


def main():
    ap = argparse.ArgumentParser(
        description="fp8-wire accuracy impact, full sharded training")
    ap.add_argument("-g", "--graph", default="synth-pubmed")
    ap.add_argument("-k", "--hidden", type=int, default=16)
    ap.add_argument("-i", "--iters", type=int, default=60)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--exchange", default="halo",
                    choices=["halo", "halo_hier"])
    ap.add_argument("--seeds", type=int, nargs="*", default=[15, 16, 17])
    ap.add_argument("--legs", nargs="*", default=None,
                    metavar="GRAPH:EXCHANGE:HIDDEN:ITERS",
                    help="multiple evaluation legs in one artifact "
                         "(e.g. synth-pubmed:halo:16:60 "
                         "synth-pubmed-hard:halo:32:100 "
                         "synth-pubmed:halo_hier:16:60); overrides "
                         "-g/-k/-i/--exchange")
    ap.add_argument("--out", default="results/fp8_wire_eval.json")
    args = ap.parse_args()

    if args.legs:
        legs = []
        for spec in args.legs:
            graph, exch, hid, iters = spec.split(":")
            legs.append((graph, exch, int(hid), int(iters)))
    else:
        legs = [(args.graph, args.exchange, args.hidden, args.iters)]

    rows = []
    for graph, exch, hid, iters in legs:
        for wire in (None, "bf16", "fp8"):
            for seed in args.seeds:
                t0 = time.time()
                r = run_one(graph, hid, iters, seed, wire, exch,
                            args.devices)
                r.update({"graph": graph, "exchange": exch,
                          "hidden": hid, "iters": iters,
                          "wire": wire or "f32", "seed": seed,
                          "wall_s": round(time.time() - t0, 1)})
                rows.append(r)
                print(f"{graph}/{exch} {r['wire']:>4} seed {seed}: "
                      f"loss {r['loss_final']:.4f} "
                      f"acc_test {r['acc_test']:.4f} ({r['wall_s']}s)",
                      flush=True)
    summary = {}
    for graph, exch, hid, iters in legs:
        leg = f"{graph}/{exch}"
        summary[leg] = {}
        for w in ("f32", "bf16", "fp8"):
            accs = [r["acc_test"] for r in rows
                    if r["wire"] == w and r["graph"] == graph
                    and r["exchange"] == exch]
            summary[leg][w] = {"acc_test_mean": float(np.mean(accs)),
                               "acc_test_min": float(np.min(accs)),
                               "acc_test_max": float(np.max(accs))}
    print("\n| leg | wire | mean acc | min..max |")
    print("|---|---|---|---|")
    for leg, by_wire in summary.items():
        for w, s in by_wire.items():
            print(f"| {leg} | {w} | {s['acc_test_mean']:.4f} "
                  f"| {s['acc_test_min']:.4f}..{s['acc_test_max']:.4f} |")

    from gcn_tpu.utils.artifacts import write_artifact
    write_artifact(
        args.out,
        {"config": {"legs": [list(l) for l in legs],
                    "devices": args.devices, "seeds": args.seeds,
                    "protocol": "full sharded training per (leg, wire, "
                                "seed) on the fake 8-device CPU mesh — "
                                "wire numerics identical to a real pod, "
                                "timing not claimed"},
         "runs": rows, "summary": summary},
        harness="examples/bench_fp8_wire.py",
        schema="fp8_wire_eval_v2")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
