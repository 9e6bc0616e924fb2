"""Distributed SpMM: local aggregation over row bands + activation gather.

Inside shard_map, each device owns one row band of A (ShardedGraph shard)
and the matching band of activations. A layer aggregation needs source
activations from every band, so the step is:

    x_full = all_gather(x_band, "data")        # ICI collective
    out_band = local_spmm(shard, x_full)       # sorted segment-sum

All-gathering at the layer's narrow width (the SpMM always runs at
min(n_in, n_out) thanks to the contraction-order rule, gcn_tpu.models.layers
.auto_order) keeps the exchanged bytes small: n * k * 4 per layer. This is
the simple baseline; the default halo-exchange path (boundary rows only,
gcn_tpu.parallel.halo) replaces it, and `ShardedGraph.boundary_fraction`
measures the difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_spmm(rows_local: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
               x_full: jnp.ndarray, rows_per_shard: int) -> jnp.ndarray:
    """out[r] = sum_e [rows_local[e]==r] vals[e] * x_full[cols[e]]."""
    gathered = jnp.take(x_full, cols, axis=0) * vals[:, None].astype(x_full.dtype)
    return jax.ops.segment_sum(gathered, rows_local,
                               num_segments=rows_per_shard,
                               indices_are_sorted=True)


def dist_spmm_gathered(shard_arrays, x_band: jnp.ndarray, rows_per_shard: int,
                       axis_name: str = "data") -> jnp.ndarray:
    """SpMM of the local row band given per-device shard arrays.

    Must be called inside shard_map over `axis_name`. shard_arrays is the
    per-device slice (rows_local, cols, vals) each of shape (1, e_max) or
    (e_max,).
    """
    rows_local, cols, vals = (a.reshape(-1) for a in shard_arrays)
    x_full = jax.lax.all_gather(x_band, axis_name, axis=0, tiled=True)
    return local_spmm(rows_local, cols, vals, x_full, rows_per_shard)
