"""Sharded GCN training step over a 1-D device mesh.

Full-batch GCN training with the graph row-partitioned across devices
(gcn_tpu.parallel.partition), expressed with shard_map so every collective
is explicit:

  * weights replicated; feature/label/mask rows sharded by band
  * per layer: local dense XW (band rows), all_gather of the narrow
    activations over ICI, local sorted-segment aggregation
  * loss: per-band masked NLL, psum'd — differentiating through shard_map
    transposes the collectives automatically (all_gather -> psum_scatter)

New capability relative to the single-GPU reference (SURVEY.md §2d), shaped
per BASELINE.md: edge partition + boundary exchange, aiming at >=90%
weak-scaling efficiency.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_tpu.models.layers import dropout as dropout_fn
from gcn_tpu.parallel.partition import ShardedGraph
from gcn_tpu.parallel.spmm_dist import dist_spmm_gathered


def make_sharded_gcn_train_step(
    mesh: Mesh,
    sg: ShardedGraph,
    tx: optax.GradientTransformation,
    *,
    dropout: float = 0.5,
    with_relu: bool = True,
    axis: str = "data",
    exchange: str = "halo",
) -> Tuple[Callable, Callable, Callable]:
    """Returns (train_step, eval_fn, shard_fn).

    train_step(params, opt_state, rng, adj, x, labels, mask) -> (params,
    opt_state, loss); eval_fn(params, adj, x) -> log_probs (row-sharded);
    shard_fn places host arrays with the right shardings.

    exchange: "halo" ships only boundary rows per layer via all_to_all
    (gcn_tpu.parallel.halo — the default; after a community reorder this is
    a small fraction of the all-gather bytes); "all_gather" exchanges full
    activations (the simple baseline).
    """
    assert exchange in ("halo", "all_gather")
    rps = sg.rows_per_shard
    if exchange == "halo":
        from gcn_tpu.parallel.halo import build_halo_plan, dist_spmm_halo

        plan = build_halo_plan(sg)
        plan_dev = (plan.send_idx, plan.col_remap)

        def band_spmm(adj_shard, plan_shard, h):
            return dist_spmm_halo(adj_shard, plan_shard, h, rps, axis)
    else:
        plan = None
        plan_dev = (jnp.zeros((sg.n_shards, 1, 1), jnp.int32),
                    jnp.zeros((sg.n_shards, 1), jnp.int32))

        def band_spmm(adj_shard, plan_shard, h):
            del plan_shard
            return dist_spmm_gathered(adj_shard, h, rps, axis)

    def forward_band(params, adj_shard, plan_shard, x_band, rng, train):
        w1, b1 = params["gc1"]["w"], params["gc1"].get("b")
        w2, b2 = params["gc2"]["w"], params["gc2"].get("b")
        # bias is added AFTER aggregation, matching GraphConvolution:
        # out = A (X W) + b (gcn1.py:52-57)
        h = jnp.dot(x_band, w1, preferred_element_type=x_band.dtype)
        h = band_spmm(adj_shard, plan_shard, h)
        if b1 is not None:
            h = h + b1
        if with_relu:
            h = jax.nn.relu(h)
            if train and dropout > 0:
                band_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
                h = dropout_fn(band_rng, h, dropout, train=True)
        h = jnp.dot(h, w2, preferred_element_type=h.dtype)
        h = band_spmm(adj_shard, plan_shard, h)
        if b2 is not None:
            h = h + b2
        return jax.nn.log_softmax(h, axis=1)

    adj_spec = (P(axis, None), P(axis, None), P(axis, None))
    plan_spec = (P(axis, None, None), P(axis, None))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), adj_spec, plan_spec, P(axis, None), P(axis),
                       P(axis), P()),
             out_specs=P())
    def loss_shmap(params, adj_shard, plan_shard, x_band, y_band, mask_band,
                   rng):
        lp = forward_band(params, adj_shard, plan_shard, x_band, rng,
                          train=True)
        picked = jnp.take_along_axis(lp, y_band[:, None], axis=1)[:, 0]
        loss_sum = -jnp.sum(picked * mask_band)
        count = jnp.sum(mask_band)
        return (jax.lax.psum(loss_sum, axis)
                / jnp.maximum(jax.lax.psum(count, axis), 1.0))

    @jax.jit
    def train_step(params, opt_state, rng, adj, x, labels, mask):
        loss, grads = jax.value_and_grad(
            lambda p: loss_shmap(p, (adj.rows_local, adj.cols, adj.vals),
                                 plan_dev, x, labels, mask, rng))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), adj_spec, plan_spec, P(axis, None)),
             out_specs=P(axis, None))
    def eval_shmap(params, adj_shard, plan_shard, x_band):
        return forward_band(params, adj_shard, plan_shard, x_band, None,
                            train=False)

    @jax.jit
    def eval_fn(params, adj, x):
        return eval_shmap(params, (adj.rows_local, adj.cols, adj.vals),
                          plan_dev, x)

    train_step.halo_plan = plan if exchange == "halo" else None

    def shard_fn(adj, x, labels, mask):
        row_sharding = NamedSharding(mesh, P(axis))
        row2 = NamedSharding(mesh, P(axis, None))
        adj = jax.device_put(adj, NamedSharding(mesh, P(axis, None)))
        return (adj,
                jax.device_put(jnp.asarray(x), row2),
                jax.device_put(jnp.asarray(labels), row_sharding),
                jax.device_put(jnp.asarray(mask), row_sharding))

    return train_step, eval_fn, shard_fn
