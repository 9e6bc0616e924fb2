"""Multi-host worker: one process = one fake host with N CPU devices.

Launched by tests/test_multihost.py (and usable standalone) to validate the
distributed training step across REAL process boundaries — the CPU stand-in
for multi-host TPU that SURVEY.md §4 calls for:

    python tests/multihost_worker.py <coordinator> <nprocs> <pid> [devices]

Each process owns `devices` fake CPU devices; together they form one global
mesh. The graph is built deterministically in every process; each process
feeds only its host-local feature/label rows via
jax.make_array_from_process_local_data (the adjacency shards travel as
program constants partitioned by GSPMD). Prints "LOSSES <json list>" on
process 0.
"""

import json
import os
import sys


def main():
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    local_devices = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices} "
        + os.environ.get("XLA_FLAGS", ""))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=pid)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcn_tpu.data.synthetic import class_features, sbm
    from gcn_tpu.graph.normalize import gcn_normalize
    from gcn_tpu.models.gcn_core import init_gcn_params
    from gcn_tpu.parallel import create_mesh, make_sharded_gcn_train_step, \
        shard_graph_by_rows
    from gcn_tpu.parallel.partition import pad_rows
    from gcn_tpu.train.optim import adam_l2

    n_shards = nprocs * local_devices
    adj, labels = sbm(n=64 * n_shards, n_classes=4, avg_degree=8.0, seed=3)
    g = gcn_normalize(adj)
    x = class_features(labels, feat_dim=16, seed=3)
    sg = shard_graph_by_rows(g, n_shards)
    mesh = create_mesh(n_shards)
    tx = adam_l2(0.01, 5e-4)
    step, eval_fn, shard_fn = make_sharded_gcn_train_step(
        mesh, sg, tx, dropout=0.0, exchange="halo")
    params = init_gcn_params(jax.random.PRNGKey(0), 16, 8, 4)

    # adjacency + plan structures come pre-sharded from shard_fn (as jit
    # arguments); per-row data is fed host-locally — each process
    # contributes only its own rows
    mask = np.ones(g.shape[0], np.float32)
    adj_dev, _, _, _ = shard_fn(sg, pad_rows(x, sg), pad_rows(labels, sg),
                                pad_rows(mask, sg))

    def place(host_global, spec):
        """Feed only this process's rows (contiguous: process-major mesh)."""
        sharding = NamedSharding(mesh, spec)
        rows_per_proc = host_global.shape[0] // nprocs
        local = host_global[pid * rows_per_proc:(pid + 1) * rows_per_proc]
        return jax.make_array_from_process_local_data(sharding, local)

    xs = place(pad_rows(x, sg), P("data", None))
    ys = place(pad_rows(labels, sg), P("data"))
    ms = place(pad_rows(mask, sg), P("data"))

    opt_state = tx.init(params)
    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(5):
        rng, r = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, r, adj_dev, xs,
                                       ys, ms)
        losses.append(float(loss))
    if pid == 0:
        print("LOSSES " + json.dumps(losses), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
