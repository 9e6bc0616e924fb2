"""Two-layer GCN with the reference's high-level API and variant ladder.

The reference ships six progressively optimized model files
(pygcn/gcn1.py..gcn6.py, SURVEY.md §2b). Here the ladder is one class with a
``variant`` switch — the variants differ only in contraction order, adjacency
representation, and preprocessing pipeline:

  v1  both layers A(XW); plain SpMM                       (gcn1.py)
  v2  layer-1 aggregation A@X hoisted out of the training loop — valid
      because input features are constant across iterations (gcn2.py:147
      recomputes it per step; hoisting is strictly better and numerically
      identical)                                          (gcn2.py)
  v3  layer-2 uses (AX)W                                  (gcn3.py:87-92)
  v4  contraction order auto-chosen from layer dims       (gcn4.py:135-139)
  v5  v4 + per-op instrumented timers + XLA-baseline SpMM (gcn5.py)
  v6  v4 + full pipeline: vertex reorder (rabbit, then degree-sort for the
      ELL scatter — column order is gather-neutral on TPU, see
      gcn_tpu/tile/ell.py) -> packed-ELL tiling -> Pallas SpMM, with
      features, labels, and index sets permuted consistently — fixing the
      reference's dead label-permutation bug (permutate.cu:17,35 vs
      gcn6.py:378; SURVEY.md §3.6.1)                      (gcn6.py)

API mirrors gcn6.GCN: fit(features, adj, labels, idx_train, idx_val=None,
train_iters, ...), test(idx_test), predict(). Outputs from predict() are
always in the ORIGINAL vertex order regardless of internal reordering.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.graph.csr import CSRGraph
from gcn_tpu.graph.normalize import gcn_normalize
from gcn_tpu.models.gcn_core import gcn_forward, init_gcn_params
from gcn_tpu.models.layers import auto_order
from gcn_tpu.ops.adjacency import device_adjacency
from gcn_tpu.ops.spmm import spmm
from gcn_tpu.train.loop import fit_gcn
from gcn_tpu.train.metrics import accuracy, masked_nll
from gcn_tpu.train.optim import adam_l2
from gcn_tpu.utils.timers import Timers

_VARIANTS = ("v1", "v2", "v3", "v4", "v5", "v6")


def _as_csr(adj) -> CSRGraph:
    if isinstance(adj, CSRGraph):
        return adj
    if hasattr(adj, "tocsr"):  # scipy
        return CSRGraph.from_scipy(adj)
    return CSRGraph.from_dense(np.asarray(adj))


def _unpermute_rows(arr: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Rows back to original vertex order, on device (a host round trip
    costs minutes through the compile relay at reddit/yelp sizes)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return jnp.take(arr, jnp.asarray(inv), axis=0)


def _as_dense_features(x) -> np.ndarray:
    if hasattr(x, "todense"):
        x = np.asarray(x.todense())
    return np.asarray(x, dtype=np.float32)


class GCN:
    def __init__(
        self,
        nfeat: int,
        nhid: int,
        nclass: int,
        dropout: float = 0.5,
        lr: float = 0.01,
        weight_decay: float = 5e-4,
        with_relu: bool = True,
        with_bias: bool = True,
        variant: str = "v4",
        adj_kind: Optional[str] = None,
        reorder: Optional[str] = None,
        seed: int = 0,
        dtype=jnp.float32,
        hoist_ax: Optional[bool] = None,
        adj_options: Optional[dict] = None,
    ):
        assert variant in _VARIANTS, f"variant must be one of {_VARIANTS}"
        self.nfeat, self.nhid, self.nclass = nfeat, nhid, nclass
        # layer-1 aggregation A@X is training-invariant whenever layer 1
        # runs A(XW) (dropout only applies after layer 1, gcn1.py:103-145),
        # so hoisting it is numerically identical and removes two of the
        # four per-iteration SpMMs (fwd + the dW1 transpose). The reference
        # only does this in gcn2; here it composes with every variant.
        if hoist_ax is None:
            hoist_ax = variant in ("v2", "v4", "v5", "v6")
        self.hoist_ax = hoist_ax or variant == "v2"
        self.dropout = dropout
        self.lr = lr
        # no-relu implies no weight decay, as in gcn1.py:80-84.
        self.weight_decay = weight_decay if with_relu else 0.0
        self.with_relu = with_relu
        self.with_bias = with_bias
        self.variant = variant
        self.reorder = reorder if reorder is not None else (
            "rabbit" if variant == "v6" else None)
        if adj_kind is None:
            adj_kind = "ell" if variant == "v6" else "auto"
        self.adj_kind = adj_kind
        # extra device_adjacency kwargs, e.g. {"table_bf16": True} or
        # {"products_bf16": True} for the big-graph bf16 trade-offs
        # (tile/ell.py documents both)
        self.adj_options = dict(adj_options or {})
        self.seed = seed
        self.dtype = dtype

        self.params = None
        self.timers = Timers()
        # populated by fit():
        self.adj_norm = None          # device adjacency (possibly permuted)
        self.features = None          # device features (possibly permuted)
        self.labels = None            # device labels (possibly permuted)
        self.perm = None              # perm[new] = old vertex id, or None
        self._inv_perm = None         # inv[old] = new
        self.output = None            # eval-mode log-probs, ORIGINAL order
        self.history = []             # per-iter loss (+val) records
        self.best_iter = -1
        self._hoisted_ax = None       # precomputed A @ X (hoist_ax)

    # ------------------------------------------------------------------ fit

    def _orders(self):
        l1 = "xw" if self.hoist_ax else "a_xw"
        if self.variant == "v1":
            # v1 keeps A(XW) everywhere but must still honor an explicit
            # hoist_ax=True — otherwise layer 1 would aggregate the
            # already-aggregated hoisted features (A(A X W)).
            return (l1, "a_xw")
        if self.variant == "v2":
            return ("xw", "a_xw")  # layer-1 SpMM hoisted into preprocessing
        if self.variant == "v3":
            return (l1, "ax_w")
        # v4/v5/v6: dimension-driven choice; layer 1 is A(XW) as in the
        # reference (gcn4.py:135: "gc1 always A(XW)"), hoisted by default.
        return (l1, auto_order(self.nhid, self.nclass))

    def _build_adjacency(self, g: CSRGraph, *, normalized: bool = True):
        """The variant's graph pipeline: reorder -> degree-sort (ELL) ->
        device adjacency. Returns (device_adj, perm) with perm[new]=old
        (or None). Used by fit() and by predict() on fresh graphs so both
        run the same perf class (gcn6.py:293-299's 4-step preprocessing)."""
        perm = None
        if self.reorder:
            from gcn_tpu.reorder import reorder_graph

            g, perm = reorder_graph(g, method=self.reorder)
        if self.adj_kind == "ell":
            # The ELL scatter wants degree-homogeneous row windows; the TPU
            # gather is column-order-neutral, so this costs the reorder
            # nothing (gcn_tpu/tile/ell.py). Stable sort keeps community
            # order among equal degrees.
            from gcn_tpu.tile import degree_sort_order

            ds = degree_sort_order(g)
            g = g.permute(ds)
            perm = ds if perm is None else perm[ds]
            if self.adj_options.get("freq_split"):
                # part-aware order: within the hot prefix and the cold
                # tail separately, re-sort by COLD-part degree so the
                # expensive packed cold table gets homogeneous windows
                # (measured 1.25x end-to-end on synth-amazon vs 1.06x
                # without — docs/RESULTS_r4.md). Symmetric, segment-
                # preserving: composes into the perm chain like any
                # reorder pass; no un-permute gathers anywhere.
                from gcn_tpu.tile.freq_split import freq_split_order

                po = freq_split_order(
                    g, hot_rows=self.adj_options.get("hot_rows"),
                    table_bf16=bool(self.adj_options.get("table_bf16")))
                if po is not None:
                    g = g.permute(po)
                    perm = po if perm is None else perm[po]

        kind = self.adj_kind
        kwargs = {}
        if kind == "auto" and max(g.shape) > 8192:
            kind = "coo"
        if kind == "ell":
            try:
                import gcn_tpu.tile  # noqa: F401
            except ImportError:
                import warnings

                warnings.warn("tiled adjacency unavailable; falling back to coo")
                kind = "coo"
        if kind in ("coo", "ell"):
            # The GCN normalization of a symmetric adjacency is symmetric, so
            # the backward pass may reuse the forward arrays (gcn6.py:49-62).
            kwargs["symmetric"] = True if normalized else None
        if kind == "ell":
            # one adjacency serves both layers without column chunking:
            # k_pad >= the widest SpMM operand (min side of each layer)
            widest = max(min(self.nhid, self.nfeat), min(self.nhid,
                                                         self.nclass))
            kwargs["k_pad"] = next(k for k in (32, 64, 128)
                                   if k >= min(widest, 128))
        if kind == "ell":
            kwargs.update(self.adj_options)
        elif self.adj_options:
            import warnings

            warnings.warn(
                f"adj_options {sorted(self.adj_options)} only apply to the "
                f"'ell' adjacency; resolved kind is {kind!r} — ignored")
        return device_adjacency(g, kind, **kwargs), perm

    def _remap_idx(self, idx):
        idx = np.asarray(idx)
        if self._inv_perm is not None:
            idx = self._inv_perm[idx]
        return jnp.asarray(idx, dtype=jnp.int32)

    def fit(
        self,
        features,
        adj,
        labels,
        idx_train,
        idx_val=None,
        *,
        train_iters: int = 200,
        initialize: bool = True,
        verbose: bool = False,
        normalize: bool = True,
        patience: int = 500,
        mode: str = "auto",
        name: str = "dataset",
        jit_loop: bool = True,
        dump_adj_csv: Optional[str] = None,
        resume_from: Optional[str] = None,
    ):
        g = _as_csr(adj)
        x = _as_dense_features(features)
        labels_np = np.asarray(labels)
        if normalize:
            g = gcn_normalize(g)
        if dump_adj_csv:
            # normalized-adjacency CSV dump for offline row analysis, the
            # gcn3.py:198 save.write hook
            from gcn_tpu.utils.writecsv import write as write_csv

            write_csv(g, name, dump_adj_csv)

        # v6 preprocessing pipeline: reorder -> permute features/labels/idx.
        self.perm = self._inv_perm = None
        adj_dev, perm = self._build_adjacency(g, normalized=normalize)
        if perm is not None:
            self.perm = perm
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.shape[0])
            self._inv_perm = inv
            x = x[perm]
            labels_np = labels_np[perm]
        self.adj_norm = adj_dev
        self.features = jnp.asarray(x, dtype=self.dtype)
        self.labels = jnp.asarray(labels_np)
        idx_train = self._remap_idx(idx_train)
        idx_val = self._remap_idx(idx_val) if idx_val is not None else None

        if initialize or self.params is None:
            self.params = init_gcn_params(
                jax.random.PRNGKey(self.seed), self.nfeat, self.nhid,
                self.nclass, self.with_bias, self.dtype)

        opt_state0 = None
        self._iters_done = 0
        rng0 = jax.random.PRNGKey(self.seed + 1)
        tx = adam_l2(self.lr, self.weight_decay)
        if resume_from is not None:
            # mid-training resume: params + optimizer + iteration + rng
            # (the rng continues the dropout stream exactly where the
            # checkpoint left it -> resume == uninterrupted)
            from gcn_tpu.utils.checkpoint import load_training_state

            self.params, opt_state0, self._iters_done, saved_rng = \
                load_training_state(resume_from, self.params,
                                    tx.init(self.params))
            if saved_rng is not None:
                rng0 = saved_rng
            if mode not in ("auto", "no_val") or idx_val is not None:
                import warnings

                warnings.warn(
                    "resume_from restores params/optimizer/rng but NOT the "
                    "best-validation snapshot or patience counter: best-val "
                    "tracking restarts at the resume point")

        orders = self._orders()
        feats = self.features
        if self.hoist_ax:
            # Hoist layer-1 aggregation: A @ X is training-invariant. Wide
            # feature matrices are aggregated in eager column chunks so only
            # one chunk's gather products are ever live (a single jit over
            # all of X materializes every chunk at once — OOM at
            # reddit/yelp scale).
            from gcn_tpu.ops.spmm import hoist_spmm

            with self.timers("hoist_ax").d as t:
                self._hoisted_ax = t.fence(
                    hoist_spmm(self.adj_norm, self.features))
            feats = self._hoisted_ax

        # graph-sized arrays ride fit_gcn's forward_data (JIT arguments,
        # never program constants — required at reddit/yelp scale)
        fdata = (feats, self.adj_norm)

        def forward(p, fd, train, rng):
            x, adj = fd
            return gcn_forward(
                p, x, adj, adj, orders=orders,
                dropout_rate=self.dropout, with_relu=self.with_relu,
                train=train, rng=rng)

        result = fit_gcn(
            self.params, tx, forward,
            self.labels, idx_train, idx_val, forward_data=fdata,
            train_iters=train_iters, mode=mode, patience=patience,
            rng=rng0, verbose=verbose,
            timers=self.timers, jit_loop=jit_loop, opt_state=opt_state0,
            start_iter=self._iters_done)
        self.params = result.params
        self.opt_state = result.opt_state
        self._final_params = result.final_params
        self._final_rng = result.final_rng
        self._iters_done += result.iters_run
        lp = result.log_probs
        if self.perm is not None:
            # back to original vertex order — ON DEVICE (a host round
            # trip costs minutes through the compile relay at scale)
            lp = _unpermute_rows(lp, self.perm)
        self.output = lp
        self.history = result.history       # per-iter loss (+val) records
        self.best_iter = result.best_iter
        return self

    # ----------------------------------------------------------- evaluation

    def predict(self, features=None, adj=None):
        """Eval-mode log-probs in original vertex order (cf. gcn6.py:548-557).

        A fresh (features, adj) pair runs the SAME pipeline as fit —
        reorder, degree sort, ELL tiling, layer-1 hoist — so inference on a
        new graph is in the same perf class as training, and outputs are
        un-permuted back to the caller's vertex order."""
        if features is None and adj is None:
            return self.output
        g = gcn_normalize(_as_csr(adj))
        x = _as_dense_features(features)
        rep, perm = self._build_adjacency(g, normalized=True)
        if perm is not None:
            x = x[perm]
        x = jnp.asarray(x, dtype=self.dtype)
        orders = self._orders()
        if orders[0] == "xw":
            from gcn_tpu.ops.spmm import hoist_spmm

            x = hoist_spmm(rep, x)
        lp = gcn_forward(self.params, x, rep, rep, orders=orders,
                         dropout_rate=self.dropout,
                         with_relu=self.with_relu, train=False)
        if perm is not None:
            lp = _unpermute_rows(lp, perm)
        return lp

    def profile_ops(self, n_iters: int = 20, warmup: int = 5,
                    verbose: bool = True) -> Timers:
        """Per-op device-fenced timing table — the v5/v6 instrumentation
        (gcn5.py:38-44, gcn6.py:404-410): xw (X@W), af (SpMM aggregation),
        bi (bias) per layer, plus whole fwd and bwd, using THIS variant's
        actual contraction orders and hoisted features (a hoisted layer 1
        has no per-iteration af row — the SpMM happened in preprocessing).
        Runs each op as its own fenced dispatch, so numbers are per-op
        upper bounds (no cross-op fusion); see
        utils.profiling.device_trace for fused op-level views."""
        assert self.params is not None and self.adj_norm is not None, \
            "call fit() first"
        t = Timers()
        adj = self.adj_norm
        p = self.params
        orders = self._orders()
        feats = self._hoisted_ax if orders[0] == "xw" else self.features
        xw = jax.jit(lambda a, w: jnp.dot(a, w,
                                          preferred_element_type=a.dtype))
        af = jax.jit(spmm)
        bi = jax.jit(lambda h, b: h + b)

        def layer(tm_prefix, h, w, b, order):
            if order == "ax_w":            # (A h) W
                with t(f"{tm_prefix}_af").d as tm:
                    h = tm.fence(af(adj, h))
                with t(f"{tm_prefix}_xw").d as tm:
                    h = tm.fence(xw(h, w))
            else:                          # A (h W); "xw" = hoisted, no af
                with t(f"{tm_prefix}_xw").d as tm:
                    h = tm.fence(xw(h, w))
                if order == "a_xw":
                    with t(f"{tm_prefix}_af").d as tm:
                        h = tm.fence(af(adj, h))
            if b is not None:
                with t(f"{tm_prefix}_bi").d as tm:
                    h = tm.fence(bi(h, b))
            return h

        # graph-sized feats/adj are jit ARGUMENTS, never closure
        # constants (CLAUDE.md: relay 413 + executable bloat)
        def fwd(pp, ff, aa):
            from gcn_tpu.models.gcn_core import gcn_forward

            return gcn_forward(pp, ff, aa, aa, orders=orders,
                               dropout_rate=0.0, with_relu=self.with_relu,
                               train=False)

        fwd_j = jax.jit(fwd)
        bwd_j = jax.jit(jax.grad(
            lambda pp, ff, aa: jnp.sum(fwd(pp, ff, aa))))
        for i in range(n_iters + warmup):
            if i == warmup:
                t.reset()
            h = layer("l1", feats, p["gc1"]["w"], p["gc1"].get("b"),
                      orders[0])
            h = jax.nn.relu(h)
            layer("l2", h, p["gc2"]["w"], p["gc2"].get("b"), orders[1])
            with t("fwd").d as tm:
                tm.fence(fwd_j(p, feats, adj))
            with t("bwd").d as tm:
                tm.fence(bwd_j(p, feats, adj))
        if verbose:
            print(t.report())
        return t

    def save_state(self, path: str) -> None:
        """Save the FULL resumable training state (last-iterate params +
        optimizer state + iteration count + rng); continue later with
        ``fit(..., resume_from=path)``."""
        from gcn_tpu.utils.checkpoint import save_training_state

        assert getattr(self, "opt_state", None) is not None, \
            "nothing to save: call fit() first"
        save_training_state(path, self._final_params, self.opt_state,
                            self._iters_done,
                            rng=getattr(self, "_final_rng", None))

    def save(self, path: str) -> None:
        """Save trained parameters (the torch.save analogue,
        profiling_gcn.py:165)."""
        from gcn_tpu.utils.checkpoint import save_params

        assert self.params is not None, "nothing to save: call fit() first"
        save_params(path, self.params)

    def load(self, path: str) -> "GCN":
        """Load parameters saved by ``save`` (the TEST branch analogue,
        profiling_gcn.py:166-170)."""
        from gcn_tpu.models.gcn_core import init_gcn_params
        from gcn_tpu.utils.checkpoint import load_params

        like = self.params if self.params is not None else init_gcn_params(
            jax.random.PRNGKey(self.seed), self.nfeat, self.nhid,
            self.nclass, self.with_bias, self.dtype)
        self.params = load_params(path, like)
        return self

    def test(self, idx_test, verbose: bool = True):
        """Test accuracy on stored outputs (cf. gcn6.py:527-546)."""
        idx = jnp.asarray(np.asarray(idx_test), dtype=jnp.int32)
        labels = self.labels
        output = self.output
        if self.perm is not None:
            # output is already in original order; un-permute labels to match.
            labels = jnp.asarray(np.asarray(self.labels)[self._inv_perm])
        loss = float(masked_nll(output, labels, idx))
        acc = float(accuracy(output, labels, idx))
        if verbose:
            print(f"Test set results: loss= {loss:.4f} accuracy= {acc:.4f}")
        return acc
