#!/usr/bin/env python
"""Weak-scaling benchmark harness for the sharded GCN training step.

Scales the graph with the device count (n = nodes_per_device * d) and
reports per-step time and weak-scaling efficiency t(1)/t(d) — the
BASELINE.md reporting points (1 chip / 1 host / N hosts). On a multi-chip
TPU slice this measures real ICI halo traffic; on a single-chip or CPU
environment run with fake devices to validate the harness:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/bench_scaling.py --devices 1 2 4 8 --kernel segsum

`--project` switches to the analytic pod-slice projection
(gcn_tpu/parallel/projection.py): the REAL halo plans are built host-side
at each device count (no devices needed — works at 256 shards on this
one-chip container) and the exchanged bytes are converted to projected
weak-scaling efficiency under stated bandwidth assumptions:

    python examples/bench_scaling.py --project --devices 8 32 128 256
"""

import argparse
import json
import os
import sys
import time


def bench_devices(d, nodes_per_device, steps, kernel, exchange,
                  exchange_dtype=None, seed=0):
    import jax
    import numpy as np

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import init_gcn_params
    from gcn_tpu.parallel import (create_mesh, make_sharded_gcn_train_step,
                                  shard_graph_by_rows)
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.reorder import reorder_graph
    from gcn_tpu.train.optim import adam_l2

    from gcn_tpu.parallel import band_degree_sort_order

    n = nodes_per_device * d
    adj, labels = sbm(n=n, n_classes=8, avg_degree=14.0, seed=seed)
    g = gcn_normalize(adj)
    g, perm = reorder_graph(g, "rabbit")
    x = class_features(labels, feat_dim=64, seed=seed)[perm]
    labels = labels[perm]
    # in-band degree sort: per-shard ELL fill without disturbing the
    # community-aligned bands (see examples/ablate_reorder.py)
    from gcn_tpu.parallel.partition import rows_per_shard_for

    bperm = band_degree_sort_order(g, rows_per_shard_for(n, d))
    g, x, labels = g.permute(bperm), x[bperm], labels[bperm]

    hosts = None
    if exchange == "halo_hier":
        from gcn_tpu.parallel import create_mesh_hier

        hosts = max(h for h in (1, 2, 4) if d % h == 0 and h <= d)
        mesh = create_mesh_hier(hosts, d // hosts)
    else:
        mesh = create_mesh(d)
    sg = shard_graph_by_rows(g, d)
    params = init_gcn_params(jax.random.PRNGKey(0), 64, 32, 8)
    tx = adam_l2(0.01, 5e-4)
    step, _, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.5, exchange=exchange, kernel=kernel,
        exchange_dtype=exchange_dtype)

    # per-level exchange accounting (rows/device/layer; 4 B/row/feature)
    stats = {}
    if d > 1 and exchange != "all_gather":
        from gcn_tpu.parallel import (build_halo_plan_hier,
                                      build_halo_plan_ragged)

        pr = build_halo_plan_ragged(sg)
        stats["flat_exchange_rows"] = sum(pr.sizes)
        if hosts and hosts > 1:
            ph = build_halo_plan_hier(sg, hosts, d // hosts)
            stats["ici_intra_rows"] = sum(ph.intra_sizes)
            stats["dcn_union_rows"] = sum(ph.inter_sizes)
            stats["ici_fanout_rows"] = ph.ici_gather_rows
    mask = np.ones(n, np.float32)
    adj_d, xs, ys, ms = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                                 pad_rows(mask, sg))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    # warm / compile
    params, opt_state, loss = step(params, opt_state, rng, adj_d, xs, ys, ms)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, rng, adj_d, xs,
                                       ys, ms)
    float(loss)
    return (time.perf_counter() - t0) / steps, stats


def run_projection_fullstep(args):
    # host-side only; never let jax reach for the TPU relay
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from gcn_tpu.parallel.projection import project_weak_scaling_fullstep

    counts = args.devices or [8, 32, 64]
    rows, meta = project_weak_scaling_fullstep(
        counts, nodes_per_device=args.nodes_per_device,
        workload=args.workload, chips_per_host=args.chips_per_host,
        nfeat=args.nfeat, nhid=args.nhid, nclass=args.nclass,
        bw_ici=args.bw_ici, bw_dcn=args.bw_dcn,
        spmm_edges_per_s=args.spmm_rate,
        bytes_per_elt=args.wire_bytes,
        exchange_chunk=None if args.no_chunk else 32)
    out = {"assumptions": meta, "rows": [r.to_json() for r in rows]}
    for r in out["rows"]:
        print(json.dumps(r))
    if args.out:
        from gcn_tpu.utils.artifacts import write_artifact
        write_artifact(args.out, out,
                       harness="examples/bench_scaling.py --fullstep",
                       schema="scaling_projection_fullstep_v1",
                       allow=["min_bw_scale_90", "hub_delta_rows"])
        print(f"wrote {args.out}")
    return 0


def run_lockstep_floor(args):
    """Measure the lockstep DCN padding floor vs a size-matched round
    schedule on exact planner volumes (host-only; VERDICT r4 #6 asked
    for a measurement in place of the standing impossibility assertion).
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from gcn_tpu.data.synthetic import geometric, powerlaw_sbm, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.parallel.halo import _pair_boundaries
    from gcn_tpu.parallel.partition import (band_degree_sort_order,
                                            shard_graph_by_rows)
    from gcn_tpu.parallel.projection import lockstep_vs_matched_dcn
    from gcn_tpu.reorder import reorder_graph

    gen = {"powerlaw": powerlaw_sbm, "sbm": sbm,
           "geometric": geometric}[args.workload]
    counts = args.devices or [64, 256]
    rows = []
    for d in counts:
        if d <= args.chips_per_host:
            print(f"d={d}: single host, no DCN — skipped")
            continue
        assert d % args.chips_per_host == 0
        hosts = d // args.chips_per_host
        n = args.nodes_per_device * d
        adj, _ = gen(n=n, n_classes=max(8, d), avg_degree=14.0, seed=0)
        g = gcn_normalize(adj)
        g, _ = reorder_graph(g, "rabbit")
        sg0 = shard_graph_by_rows(g, d)
        g = g.permute(band_degree_sort_order(g, sg0.rows_per_shard))
        sg = shard_graph_by_rows(g, d)
        needed, _ = _pair_boundaries(sg)
        r = lockstep_vs_matched_dcn(needed, d, hosts,
                                    args.chips_per_host)
        r.update(devices=d, hosts=hosts, n_rows=n,
                 matched_saving=round(r["lockstep"] / max(r["matched"], 1),
                                      4),
                 lockstep_over_mean=round(
                     r["lockstep"] / max(r["mean"], 1), 4),
                 rank_bound_over_mean=round(
                     r["rank_bound"] / max(r["mean"], 1), 4))
        rows.append(r)
        print(json.dumps(r))
    if args.out:
        from gcn_tpu.utils.artifacts import write_artifact
        write_artifact(args.out, {
            "workload": args.workload,
            "nodes_per_device": args.nodes_per_device,
            "chips_per_host": args.chips_per_host,
            "definition": "rows/device/exchange totals: lockstep = "
                          "shipped offset schedule (pads each round to "
                          "its max); matched = feasible size-matched "
                          "bottleneck-matching schedule; rank_bound = "
                          "schedule-relaxed floor (not generally "
                          "feasible); mean = padding-free per-source "
                          "mean (infeasible with static shapes)",
            "rows": rows,
        }, harness="examples/bench_scaling.py --lockstep-floor",
            schema="lockstep_floor_v1")
        print(f"wrote {args.out}")
    return 0


def run_projection(args):
    # host-side only; never let jax reach for the TPU relay
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from gcn_tpu.parallel.projection import (DEFAULTS, measured_spmm_rate,
                                             project_weak_scaling)

    rate, rate_src = ((args.spmm_rate, "caller") if args.spmm_rate
                      else measured_spmm_rate())
    counts = args.devices or [8, 32, 128, 256]
    rows = project_weak_scaling(
        counts, nodes_per_device=args.nodes_per_device,
        chips_per_host=args.chips_per_host, bw_ici=args.bw_ici,
        bw_dcn=args.bw_dcn, spmm_edges_per_s=rate,
        bytes_per_elt=args.wire_bytes)
    out = {
        # every entry records the value ACTUALLY used for the rows
        "assumptions": {
            "chips_per_host": args.chips_per_host,
            "feat_width": DEFAULTS["feat_width"],
            "bytes_per_elt": args.wire_bytes,
            "bw_ici_B_per_s": args.bw_ici, "bw_dcn_B_per_s": args.bw_dcn,
            "spmm_edges_per_s": rate, "spmm_rate_source": rate_src,
            "nodes_per_device": args.nodes_per_device,
            "note": "byte counts are exact plan outputs; only the "
                    "time conversion is modeled (module docstring)",
        },
        "rows": [r.to_json() for r in rows],
    }
    for r in out["rows"]:
        print(json.dumps(r))
    if args.out:
        from gcn_tpu.utils.artifacts import write_artifact
        # min_bw_scale_90 can legitimately exceed 1 (it is a scale, not
        # an efficiency)
        write_artifact(args.out, out, harness="examples/bench_scaling.py",
                       schema="scaling_projection_v2",
                       allow=["min_bw_scale_90"])
        print(f"wrote {args.out}")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, nargs="*", default=None,
                    help="device counts to sweep (default: 1..all, pow2)")
    ap.add_argument("--nodes-per-device", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--kernel", default="segsum", choices=["segsum", "ell"])
    ap.add_argument("--exchange", default="halo",
                    choices=["halo", "halo_padded", "halo_hier",
                             "all_gather"])
    ap.add_argument("--project", action="store_true",
                    help="analytic pod-slice projection (no devices)")
    ap.add_argument("--lockstep-floor", action="store_true",
                    help="host-only: measure the lockstep DCN padding "
                         "floor vs a size-matched round schedule "
                         "(projection.lockstep_vs_matched_dcn)")
    ap.add_argument("--fullstep", action="store_true",
                    help="full-train-step projection: 4 boundary-first "
                         "exchanges at layer-output widths, k-chunked "
                         "pipeline credit, hub-replication check "
                         "(projection.project_weak_scaling_fullstep)")
    ap.add_argument("--workload", default="powerlaw",
                    choices=["powerlaw", "sbm", "geometric"])
    ap.add_argument("--nfeat", type=int, default=128)
    ap.add_argument("--nhid", type=int, default=128)
    ap.add_argument("--nclass", type=int, default=40)
    ap.add_argument("--no-chunk", action="store_true",
                    help="disable the k-chunk pipeline credit")
    ap.add_argument("--chips-per-host", type=int, default=8)
    ap.add_argument("--bw-ici", type=float, default=9.0e10,
                    help="assumed per-chip ICI bandwidth, B/s")
    ap.add_argument("--bw-dcn", type=float, default=6.25e9,
                    help="assumed per-chip DCN bandwidth, B/s")
    ap.add_argument("--spmm-rate", type=float, default=None,
                    help="single-chip SpMM edges/s; default: read from "
                         "the newest BENCH_r*.json with provenance "
                         "(projection.measured_spmm_rate)")
    ap.add_argument("--halo-bf16", action="store_true",
                    help="exchange_dtype='bf16': 2 B/elt on the wire "
                         "(live bench AND --project projection)")
    ap.add_argument("--halo-wire", default=None,
                    choices=["f32", "bf16", "fp8"],
                    help="wire dtype: f32 4 B/elt, bf16 2, fp8 1 "
                         "(float8_e4m3fn, clipped) — live bench AND "
                         "projections. Overrides --halo-bf16.")
    ap.add_argument("--out", default=None,
                    help="write the full projection JSON here")
    args = ap.parse_args()
    # one resolved wire policy for the live bench and both projections
    wire = args.halo_wire or ("bf16" if args.halo_bf16 else "f32")
    args.wire_dtype = None if wire == "f32" else wire
    args.wire_bytes = {"f32": 4, "bf16": 2, "fp8": 1}[wire]

    if args.lockstep_floor:
        return run_lockstep_floor(args)
    if args.fullstep:
        return run_projection_fullstep(args)
    if args.project:
        return run_projection(args)

    import jax

    avail = len(jax.devices())
    counts = args.devices or [d for d in (1, 2, 4, 8, 16, 32)
                              if d <= avail]
    results = []
    t1 = None
    for d in counts:
        t, stats = bench_devices(d, args.nodes_per_device, args.steps,
                                 args.kernel, args.exchange,
                                 args.wire_dtype)
        if t1 is None:
            t1 = t
        eff = t1 / t
        results.append({"devices": d, "step_ms": round(t * 1e3, 2),
                        "weak_scaling_efficiency": round(eff, 3), **stats})
        print(json.dumps(results[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
