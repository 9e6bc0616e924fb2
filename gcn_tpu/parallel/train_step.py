"""Sharded GCN training step over a 1-D device mesh.

Full-batch GCN training with the graph row-partitioned across devices
(gcn_tpu.parallel.partition), expressed with shard_map so every collective
is explicit:

  * weights replicated; feature/label/mask rows sharded by band
  * per layer: local dense XW (band rows), boundary exchange over ICI,
    local aggregation
  * loss: per-band masked NLL, psum'd — differentiating through shard_map
    transposes the collectives automatically (all_to_all -> all_to_all,
    all_gather -> psum_scatter)

Knobs:
  exchange="halo"        per-ring-offset ppermutes of just the boundary
                         rows, each offset at its own static payload
                         (gcn_tpu.parallel.halo ragged plan) — the default
  exchange="halo_padded" one all_to_all padded to the global max pair
                         boundary (the round-2 plan; kept for ablation)
  exchange="all_gather"  full-activation gather (simple baseline)
  kernel="ell"           per-shard aggregation through the packed-ELL
                         SpMM (gcn_tpu.ops.ell_spmm); requires halo —
                         the default (flagship path)
  kernel="segsum"        XLA sorted-segment-sum (portable fallback)
  exchange_dtype="bf16"  cast the exchange payload to bfloat16 on the
                         wire only: ICI/DCN bytes halve, halo rows are
                         cast back to the compute dtype on arrival (one
                         bf16 rounding on boundary rows; the projection
                         shows multi-host efficiency is DCN-byte-bound,
                         docs/RESULTS_r3.md)
  exchange_dtype="fp8"   quarter the wire bytes: float8_e4m3fn payload
                         (clipped to the fp8 finite range before the
                         cast — e4m3fn overflows to NaN, see
                         halo._prep_send). ~6% max per-element relative
                         rounding on boundary rows, forward AND
                         gradient exchanges both compressed; opt-in for
                         the DCN-byte-bound pod-scale regime
                         (docs/RESULTS_r4.md measures the accuracy
                         impact)
  overlap=True           pass-block partition of the monolithic layout
                         (round 5): interior-only blocks aggregate
                         UNDER the exchange at monolithic slot cost —
                         the default. overlap="split" keeps the
                         row-split parts as the ablation. Whenever no
                         tensor-parallel model axis is in play (the 1-D
                         data mesh AND the hierarchical host x chip
                         mesh) this is the FUSED boundary-rows-first form
                         (halo.dist_spmm_halo_ell_overlap_xw): send rows
                         are transformed by a small gather+matmul so the
                         collective launches before the full-band X@W,
                         putting both the big dot and the interior
                         aggregation under the exchange window
  exchange_chunk="auto"  k-chunked pipelined exchange (round 4): when a
                         layer's output width exceeds this, the exchange
                         and the boundary aggregation split into
                         ceil(f_out/chunk) independent feature slices,
                         so received slices aggregate while later
                         slices are still on the wire — the boundary
                         SpMM itself becomes overlap budget. Numerically
                         exact (column-independent); "auto" = the
                         kernel's k_pad (one native tile per slice);
                         None disables
  k_pad=32               ELL slot width for the per-shard kernels; set
                         128 for wide-hidden layers (one gather pass
                         for k<=128 — 8.2x over column-chunking,
                         results/kpad_sweep.json; the lockstep spans in
                         build_sharded_ell keep the grouped reduce)

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


def _shard_specs_like(tree, axis):
    """P(axis, None, ...) for every array leaf of a pytree."""
    return jax.tree_util.tree_map(
        lambda leaf: P(axis, *([None] * (leaf.ndim - 1))), tree)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_model_params(params, model_axis_size: int):
    """Zero-pad GCN params so nfeat and nhid divide the model-axis size.

    The padded entries stay EXACTLY zero through training — padded x
    columns are zero so dw1-pad-row grads vanish; padded hidden units see
    zero pre-activations (b1 pad zero) and zero w2 rows, so their entire
    gradient chain is zero, and the multiplicative weight decay keeps
    zeros at zero — hence the padded model is numerically identical to
    the unpadded one. Pair with shard_fn, which pads x's feature columns
    to the same multiple. Call once before training on a 2-D mesh whose
    model axis does not divide nfeat/nhid.
    """
    m = model_axis_size
    gc1 = dict(params["gc1"])
    gc2 = dict(params["gc2"])
    w1, w2 = jnp.asarray(gc1["w"]), jnp.asarray(gc2["w"])
    f_pad = _round_up(w1.shape[0], m) - w1.shape[0]
    h_pad = _round_up(w1.shape[1], m) - w1.shape[1]
    gc1["w"] = jnp.pad(w1, ((0, f_pad), (0, h_pad)))
    if gc1.get("b") is not None:
        gc1["b"] = jnp.pad(jnp.asarray(gc1["b"]), ((0, h_pad),))
    gc2["w"] = jnp.pad(w2, ((0, h_pad), (0, 0)))
    return {"gc1": gc1, "gc2": gc2}


def make_sharded_gcn_train_step(
    mesh: Mesh,
    sg: ShardedGraph,
    tx: optax.GradientTransformation,
    *,
    dropout: float = 0.5,
    with_relu: bool = True,
    axis: str = "data",
    exchange: str = "halo",
    kernel: str = None,
    overlap=True,
    model_axis: str = None,
    with_bias: bool = True,
    exchange_dtype: str = None,
    exchange_chunk="auto",
    k_pad: int = 32,
    widths: tuple = None,
) -> Tuple[Callable, Callable, Callable]:
    """Returns (train_step, eval_fn, shard_fn).

    train_step(params, opt_state, rng, adj, x, labels, mask) -> (params,
    opt_state, loss); eval_fn(params, adj, x) -> log_probs (row-sharded);
    shard_fn places host arrays with the right shardings.

    ``overlap``: True/"blocks" (default) = the pass-block partition of
    the monolithic lockstep layout (interior-only blocks hide the
    exchange at monolithic slot cost); "split" = the row-split
    interior/boundary parts (part-degree-sorted; 1.34-1.51x kernel
    cost, kept as the ablation baseline); False = monolithic, no
    overlap.

    ``exchange_dtype="auto"`` resolves to bf16 or fp8 via
    ``projection.recommend_wire_dtype`` on this run's exact plan volumes
    (fp8 only in the DCN-byte-bound hier regime); pass ``widths=(nfeat,
    nhid, nclass)`` so the policy prices the real layer widths (defaults
    to the projection's realistic-width assumptions otherwise).

    ``model_axis``: name of an extra mesh axis for tensor parallelism
    over the feature/hidden dimension (create_mesh_2d, or
    create_mesh_hier_model for the hier x model 3-D composition —
    exchange="halo_hier" with axis=("host", "chip")). Per band:
    x is column-sharded, X@W1 computes a partial product that
    psum_scatters into hidden shards, the halo exchange + layer-1
    aggregation and the layer-2 SpMM run on the hidden SHARD (splitting
    the SpMM work across the model axis too), and W2's contraction
    psums back to full class columns. nfeat and nhid must divide the
    model-axis size — for widths that don't, run the params through
    ``pad_model_params(params, m)`` once before training (shard_fn pads
    x's columns to match; padding is numerically inert, see the helper's
    docstring). Composes with every exchange/kernel knob.
    """
    assert exchange in ("halo", "halo_padded", "halo_hier", "all_gather")
    assert exchange_dtype in (None, "auto", "bf16", "fp8"), exchange_dtype
    assert exchange_dtype is None or exchange != "all_gather", \
        "exchange_dtype applies to the halo exchanges only; the " \
        "all_gather baseline always ships the compute dtype"
    if exchange_chunk == "auto":
        # each pipelined exchange slice should be one native kernel tile
        # (halo.dist_spmm_halo_ell_overlap_xw chunk docstring): a slice
        # narrower than k_pad pads its boundary SpMM to k_pad lanes;
        # None still disables chunking entirely
        exchange_chunk = k_pad
    if kernel is None:
        # flagship default: packed-ELL + overlapped halo; the all_gather
        # baseline keeps the portable segment-sum
        kernel = "segsum" if exchange == "all_gather" else "ell"
    assert kernel in ("segsum", "ell")
    rps = sg.rows_per_shard
    halo_like = exchange in ("halo", "halo_padded", "halo_hier")

    # --- aggregation strategy -------------------------------------------
    if exchange == "halo_hier":
        # two-level host x chip exchange: the row partition spans BOTH
        # mesh axes; ``axis`` must be the (host, chip) axis-name tuple
        from gcn_tpu.parallel.halo import (build_halo_plan_hier,
                                           make_halo_exchange)

        if not isinstance(axis, tuple):
            axis = ("host", "chip")
        nh, nc = mesh.shape[axis[0]], mesh.shape[axis[1]]
        plan = build_halo_plan_hier(sg, nh, nc)
        plan_dev = plan.device_arrays
    elif halo_like:
        from gcn_tpu.parallel.halo import (build_halo_plan,
                                           build_halo_plan_ragged)

        plan = (build_halo_plan_ragged(sg) if exchange == "halo"
                else build_halo_plan(sg))
        plan_dev = plan.device_arrays
    else:
        plan = None
        plan_dev = (jnp.zeros((sg.n_shards, 1, 1), jnp.int32),
                    jnp.zeros((sg.n_shards, 1), jnp.int32))
    if halo_like:
        from gcn_tpu.parallel.halo import make_halo_exchange

        if exchange_dtype == "auto":
            # DCN-byte-bound policy on THIS run's exact plan volumes
            # (projection.recommend_wire_dtype: bf16 unless the hier
            # plan's bf16 full-step projection misses 90% and fp8
            # closes some of the gap)
            from gcn_tpu.parallel.projection import recommend_wire_dtype

            exchange_dtype, why = recommend_wire_dtype(sg, plan,
                                                       widths=widths)
            import logging

            logging.getLogger(__name__).info(
                "auto halo wire -> %s (%s)", exchange_dtype, why)
        wire_dtype = {None: None, "bf16": jnp.bfloat16,
                      "fp8": jnp.float8_e4m3fn}[exchange_dtype]
        ex_fn = make_halo_exchange(plan, wire_dtype)
    else:
        assert exchange_dtype != "auto"
        ex_fn = None

    band_spmm_xw = None   # set on the fused (ell + overlap) path only
    if kernel == "ell":
        assert halo_like, "kernel='ell' requires a halo exchange"
        from gcn_tpu.parallel.halo import (build_sharded_ell,
                                           dist_spmm_halo_ell,
                                           dist_spmm_halo_ell_overlap,
                                           unstack_ell_shard)

        if overlap == "blocks" or overlap is True:
            # pass-BLOCK partition of the monolithic layout (round 5,
            # the default): interior-only blocks gather straight from
            # the band and run under the exchange; halo-touching blocks
            # cover the rest over concat(halo, band). Monolithic slot
            # cost (the row-split parts measured 1.34-1.51x the plain
            # kernel; this partition's slots equal the monolithic
            # table's + a per-window floor) — docs/RESULTS_r5.md.
            from gcn_tpu.parallel.halo import (
                build_sharded_ell_blocks,
                dist_spmm_halo_ell_overlap_blocks,
                dist_spmm_halo_ell_overlap_blocks_xw)

            ell_int_b, ell_halo_b = build_sharded_ell_blocks(
                sg, plan, k_pad=k_pad)

            def band_spmm(extra_shard, plan_shard, h):
                e_int, e_halo = extra_shard
                return dist_spmm_halo_ell_overlap_blocks(
                    unstack_ell_shard(e_int), unstack_ell_shard(e_halo),
                    plan_shard, h, axis, exchange=ex_fn)

            def band_spmm_xw(extra_shard, plan_shard, x, w):
                e_int, e_halo = extra_shard
                return dist_spmm_halo_ell_overlap_blocks_xw(
                    unstack_ell_shard(e_int), unstack_ell_shard(e_halo),
                    plan_shard, x, w, axis, exchange=ex_fn,
                    chunk=exchange_chunk)

            extra_dev = (ell_int_b, ell_halo_b)
        elif overlap:  # "split": the row-split parts (ablation baseline)
            from gcn_tpu.parallel.halo import dist_spmm_halo_ell_overlap_xw

            # part-degree-sorted rows per part (round 5): ~27% fewer
            # gather slots than the shared in-band order; outputs are
            # restored to band order by unpermute_rows inside the dist
            # functions (gather-only, custom-vjp'd)
            ell_int, int_take, int_back = build_sharded_ell(
                sg, plan, part="interior", k_pad=k_pad, part_order=True)
            ell_bnd, bnd_take, bnd_back = build_sharded_ell(
                sg, plan, part="boundary", k_pad=k_pad, part_order=True)

            def _unpack(extra_shard):
                e_int, e_bnd, it, ib, bt, bb = extra_shard
                return (unstack_ell_shard(e_int),
                        unstack_ell_shard(e_bnd),
                        (it[0], ib[0]), (bt[0], bb[0]))

            def band_spmm(extra_shard, plan_shard, h):
                e_int, e_bnd, iu, bu = _unpack(extra_shard)
                return dist_spmm_halo_ell_overlap(
                    e_int, e_bnd, plan_shard, h, axis, exchange=ex_fn,
                    int_unperm=iu, bnd_unperm=bu)

            def band_spmm_xw(extra_shard, plan_shard, x, w):
                # fused A @ (X W): boundary rows transform first so the
                # exchange launches before the full-band matmul; at
                # f_out > exchange_chunk the exchange + boundary
                # aggregation pipeline in k_pad-sized feature slices
                # (halo.dist_spmm_halo_ell_overlap_xw chunk docstring)
                e_int, e_bnd, iu, bu = _unpack(extra_shard)
                return dist_spmm_halo_ell_overlap_xw(
                    e_int, e_bnd, plan_shard, x, w, axis, exchange=ex_fn,
                    chunk=exchange_chunk, int_unperm=iu, bnd_unperm=bu)

            extra_dev = (ell_int, ell_bnd, int_take, int_back,
                         bnd_take, bnd_back)
        else:
            ell_stacked = build_sharded_ell(sg, plan, k_pad=k_pad)

            def band_spmm(extra_shard, plan_shard, h):
                return dist_spmm_halo_ell(unstack_ell_shard(extra_shard),
                                          plan_shard, h, axis,
                                          exchange=ex_fn)

            extra_dev = ell_stacked
    elif halo_like:
        from gcn_tpu.parallel.halo import dist_spmm_halo

        def band_spmm(extra_shard, plan_shard, h):
            return dist_spmm_halo(extra_shard, plan_shard, h, rps, axis,
                                  exchange=ex_fn)

        extra_dev = None  # filled with the COO triple at call time
    else:
        def band_spmm(extra_shard, plan_shard, h):
            del plan_shard
            return dist_spmm_gathered(extra_shard, h, rps, axis)

        extra_dev = None

    # --- forward over one band ------------------------------------------
    def forward_band(params, extra_shard, plan_shard, x_band, rng, train):
        w1, b1 = params["gc1"]["w"], params["gc1"].get("b")
        w2, b2 = params["gc2"]["w"], params["gc2"].get("b")
        # bias is added AFTER aggregation, matching GraphConvolution:
        # out = A (X W) + b (gcn1.py:52-57)
        fused = band_spmm_xw is not None and model_axis is None
        if fused:
            # boundary-rows-first exchange: the big X@W1 dot and the
            # interior aggregation both run under the collective
            h = band_spmm_xw(extra_shard, plan_shard, x_band, w1)
        else:
            h = jnp.dot(x_band, w1, preferred_element_type=x_band.dtype)
        if model_axis is not None:
            # x cols and w1 rows are model-sharded: the dot built partial
            # sums; reduce-scatter them into hidden shards so the halo
            # exchange, aggregation, and layer-2 SpMM all run on H/m
            # columns per chip
            h = jax.lax.psum_scatter(h, model_axis, scatter_dimension=1,
                                     tiled=True)
        if not fused:
            h = band_spmm(extra_shard, plan_shard, h)
        if b1 is not None:
            h = h + b1
        if with_relu:
            h = jax.nn.relu(h)
            if train and dropout > 0:
                band_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
                if model_axis is not None:
                    band_rng = jax.random.fold_in(
                        band_rng, jax.lax.axis_index(model_axis))
                h = dropout_fn(band_rng, h, dropout, train=True)
        if fused:
            h = band_spmm_xw(extra_shard, plan_shard, h, w2)
        elif model_axis is None:
            h = jnp.dot(h, w2, preferred_element_type=h.dtype)
            h = band_spmm(extra_shard, plan_shard, h)
        else:
            # (A h) W ordering: aggregate the hidden SHARD (the layer-2
            # SpMM splits over the model axis), then contract with the
            # matching W2 row shard and psum to full class columns.
            # Numerically identical: A (h W) == (A h) W.
            h = band_spmm(extra_shard, plan_shard, h)
            h = jnp.dot(h, w2, preferred_element_type=h.dtype)
            h = jax.lax.psum(h, model_axis)
        if b2 is not None:
            h = h + b2
        return jax.nn.log_softmax(h, axis=1)

    coo_triple = (sg.rows_local, sg.cols, sg.vals)
    extra = extra_dev if extra_dev is not None else coo_triple
    extra_spec = _shard_specs_like(extra, axis)
    plan_spec = _shard_specs_like(plan_dev, axis)
    if model_axis is None:
        param_spec = P()
        x_spec = P(axis, None)
    else:
        # tensor parallelism: w1 rows (input features) and w2 rows
        # (hidden) shard over the model axis; b1 follows the hidden
        # shard produced by the psum_scatter; b2 stays replicated.
        # with_bias must match the params structure (shard_map specs are
        # structural).
        gc1 = {"w": P(model_axis, None)}
        gc2 = {"w": P(model_axis, None)}
        if with_bias:
            gc1["b"] = P(model_axis)
            gc2["b"] = P()
        param_spec = {"gc1": gc1, "gc2": gc2}
        x_spec = P(axis, model_axis)
    # the adjacency structures enter the jitted programs as ARGUMENTS
    # (via shard_fn / the adj parameter), never as closure constants —
    # constants bloat executables and hit compile-service size limits at
    # big-graph scale

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(param_spec, extra_spec, plan_spec, x_spec, P(axis),
                       P(axis), P()),
             out_specs=P(), check_vma=False)
    def loss_shmap(params, extra_shard, plan_shard, x_band, y_band,
                   mask_band, rng):
        lp = forward_band(params, extra_shard, plan_shard, x_band, rng,
                          train=True)
        picked = jnp.take_along_axis(lp, y_band[:, None], axis=1)[:, 0]
        loss_sum = -jnp.sum(picked * mask_band)
        count = jnp.sum(mask_band)
        return (jax.lax.psum(loss_sum, axis)
                / jnp.maximum(jax.lax.psum(count, axis), 1.0))

    @jax.jit
    def train_step(params, opt_state, rng, adj, x, labels, mask):
        extra_a, plan_a = adj
        loss, grads = jax.value_and_grad(
            lambda p: loss_shmap(p, extra_a, plan_a, x, labels, mask,
                                 rng))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(param_spec, extra_spec, plan_spec, x_spec),
             out_specs=P(axis, None), check_vma=False)
    def eval_shmap(params, extra_shard, plan_shard, x_band):
        return forward_band(params, extra_shard, plan_shard, x_band, None,
                            train=False)

    @jax.jit
    def eval_fn(params, adj, x):
        extra_a, plan_a = adj
        return eval_shmap(params, extra_a, plan_a, x)

    def shard_fn(adj, x, labels, mask):
        del adj  # the right structure is built here from sg/plan
        row_sharding = NamedSharding(mesh, P(axis))
        row2 = NamedSharding(mesh, x_spec)
        x = jnp.asarray(x)
        if model_axis is not None:
            # zero-pad feature columns to the model-axis multiple (the
            # matching zero-padded params come from pad_model_params)
            m = mesh.shape[model_axis]
            f_pad = _round_up(x.shape[1], m) - x.shape[1]
            if f_pad:
                x = jnp.pad(x, ((0, 0), (0, f_pad)))
        extra_sh = jax.tree_util.tree_map(
            lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
            extra, extra_spec)
        plan_sh = jax.tree_util.tree_map(
            lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)),
            plan_dev, plan_spec)
        return ((extra_sh, plan_sh),
                jax.device_put(jnp.asarray(x), row2),
                jax.device_put(jnp.asarray(labels), row_sharding),
                jax.device_put(jnp.asarray(mask), row_sharding))

    return train_step, eval_fn, shard_fn
