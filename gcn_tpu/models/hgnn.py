"""Hypergraph GNN (HGNN) — pyhgnn model family.

Functional core + class wrapper matching the reference model
(pyhgnn/models/HGNN.py:27-59): two HGNN_conv layers
``x -> relu(G (x W1 + b1)) -> dropout -> G (x W2 + b2)`` over the hypergraph
Laplacian-like operator G (gcn_tpu.graph.hypergraph.generate_G_from_H), with
the reference's training recipe (pyhgnn/train.py:47-155): Adam(lr 1e-3,
wd 5e-4), MultiStepLR gamma decay, CrossEntropy loss, best-val snapshot.

Init matches torch defaults used there: HGNN_conv resets weight/bias with
uniform(-1/sqrt(out), 1/sqrt(out)) (pyhgnn/models/layers.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gcn_tpu.graph.csr import CSRGraph
from gcn_tpu.models.layers import dropout as dropout_fn
from gcn_tpu.models.layers import init_linear
from gcn_tpu.ops.adjacency import device_adjacency
from gcn_tpu.ops.spmm import spmm
from gcn_tpu.train.metrics import accuracy
from gcn_tpu.utils.timers import Timers


def init_hgnn_params(key, in_ch: int, n_hid: int, n_class: int,
                     dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "hgc1": init_linear(k1, in_ch, n_hid, True, dtype),
        "hgc2": init_linear(k2, n_hid, n_class, True, dtype),
    }


def hgnn_forward(params, x, g_adj, *, dropout: float = 0.5,
                 train: bool = False, rng=None, gx=None, g_rowsum=None):
    """Returns logits (n, n_class). HGNN_conv is x W + b then G @ (.)
    (HGNN.py:27-38) — i.e. the A(XW) contraction order.

    When ``gx``/``g_rowsum`` are given, layer 1 uses the training-invariant
    expansion G(XW + 1 b^T) = (GX)W + (G1)b^T — numerically identical and
    SpMM-free (X is constant; dropout only applies after layer 1), halving
    the per-epoch SpMM count like the GCN hoist (gcn_tpu/models/gcn.py).
    """
    if gx is not None:
        h = (jnp.dot(gx, params["hgc1"]["w"],
                     preferred_element_type=gx.dtype)
             + g_rowsum[:, None] * params["hgc1"]["b"][None, :])
    else:
        h = jnp.dot(x, params["hgc1"]["w"],
                    preferred_element_type=x.dtype) + params["hgc1"]["b"]
        h = spmm(g_adj, h)
    h = jax.nn.relu(h)
    if train and dropout > 0:
        h = dropout_fn(rng, h, dropout, train=True)
    h = jnp.dot(h, params["hgc2"]["w"],
                preferred_element_type=h.dtype) + params["hgc2"]["b"]
    return spmm(g_adj, h)


def cross_entropy(logits, labels, idx):
    lp = jax.nn.log_softmax(jnp.take(logits, idx, axis=0), axis=1)
    y = jnp.take(labels, idx, axis=0)
    return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))


class HGNN:
    """Class API mirroring pyhgnn's train_model driver (train.py:47-128)."""

    def __init__(self, in_ch: int, n_class: int, n_hid: int = 128,
                 dropout: float = 0.5, lr: float = 0.001,
                 weight_decay: float = 5e-4,
                 milestones: Sequence[int] = (100,), gamma: float = 0.9,
                 adj_kind: str = "auto", seed: int = 0):
        self.in_ch, self.n_class, self.n_hid = in_ch, n_class, n_hid
        self.dropout = dropout
        self.lr, self.weight_decay = lr, weight_decay
        self.milestones, self.gamma = list(milestones), gamma
        self.adj_kind = adj_kind
        self.seed = seed
        self.params = None
        self.timers = Timers()
        self.best_acc = 0.0
        self.output = None

    def _optimizer(self):
        # torch MultiStepLR: lr *= gamma at each milestone epoch.
        def schedule(count):
            m = jnp.asarray(self.milestones)
            return self.lr * self.gamma ** jnp.sum(count >= m)

        return optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )

    def _lower(self, g_csr: CSRGraph):
        kind = self.adj_kind
        if kind == "auto" and g_csr.shape[0] * g_csr.shape[1] > 8192 ** 2:
            # large hypergraph: packed-ELL kernel at the HGNN hidden
            # width. The cutoff is dense-AREA (footprint), not
            # max-dimension: TwoHopAdj factors are rectangular
            # (n_vertices x n_edges), and a tall-skinny factor whose
            # dense form still fits the 8192^2-equivalent budget runs
            # faster as one MXU matmul than as a per-nnz gather.
            kind = "ell"
        if kind == "ell":
            return device_adjacency(
                g_csr, "ell", k_pad=128 if self.n_hid > 64 else 32)
        return device_adjacency(g_csr, kind)

    def fit(self, features, G, labels, idx_train, idx_val=None, *,
            num_epochs: int = 600, verbose: bool = False,
            print_freq: int = 100, jit_loop: bool = True,
            resume_from: str = None):
        from gcn_tpu.ops.spmm import TwoHopAdj

        if isinstance(G, TwoHopAdj):
            adj = G
        elif isinstance(G, tuple) and len(G) == 2:
            # factored G = A1 @ A2 (graph.hypergraph.generate_G_factors):
            # the scalable formulation — never materializes the n x n chain
            adj = TwoHopAdj(*(self._lower(a) for a in G))
        else:
            if isinstance(G, CSRGraph):
                g_csr = G
            elif hasattr(G, "tocsr"):
                g_csr = CSRGraph.from_scipy(G)
            else:
                g_csr = CSRGraph.from_dense(np.asarray(G))
            adj = self._lower(g_csr)
        x = jnp.asarray(np.asarray(features), dtype=jnp.float32)
        labels = jnp.asarray(np.asarray(labels))
        idx_train = jnp.asarray(np.asarray(idx_train), dtype=jnp.int32)
        if idx_val is not None:
            idx_val = jnp.asarray(np.asarray(idx_val), dtype=jnp.int32)

        if self.params is None:
            self.params = init_hgnn_params(
                jax.random.PRNGKey(self.seed), self.in_ch, self.n_hid,
                self.n_class)
        tx = self._optimizer()
        opt_state = tx.init(self.params)
        self._epochs_done = 0
        rng = jax.random.PRNGKey(self.seed + 1)
        if resume_from is not None:
            # full resume: the MultiStepLR schedule position rides in the
            # optax state and the dropout rng stream continues where the
            # checkpoint left it
            from gcn_tpu.utils.checkpoint import load_training_state

            self.params, opt_state, self._epochs_done, saved_rng = \
                load_training_state(resume_from, self.params, opt_state)
            if saved_rng is not None:
                rng = saved_rng
            if idx_val is not None:
                import warnings

                warnings.warn(
                    "resume_from restores params/optimizer/rng but NOT "
                    "the best-val snapshot: best tracking restarts here")

        # hoist the training-invariant layer-1 aggregation: GX in eager
        # feature chunks (wide .mat features) + the row sums for the bias
        # term — see hgnn_forward's G(XW+b) = (GX)W + (G1)b^T expansion
        from gcn_tpu.ops.spmm import _jit_spmm, hoist_spmm

        with self.timers("hoist_gx").d as t:
            gx = t.fence(hoist_spmm(adj, x))
        g_rowsum = _jit_spmm(adj, jnp.ones((x.shape[0], 1),
                                           jnp.float32))[:, 0]

        # graph-sized arrays enter every jitted program as ARGUMENTS, not
        # closure constants (constants blow up the executable at scale)
        @jax.jit
        def step_a(p, o, zz, rs, aa, yl, idx, r):
            def loss_fn(pp):
                logits = hgnn_forward(pp, None, aa, dropout=self.dropout,
                                      train=True, rng=r, gx=zz, g_rowsum=rs)
                return cross_entropy(logits, yl, idx)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        @jax.jit
        def evaluate_a(p, zz, rs, aa):
            return hgnn_forward(p, None, aa, train=False, gx=zz,
                                g_rowsum=rs)

        def step(p, o, r):
            return step_a(p, o, gx, g_rowsum, adj, labels, idx_train, r)

        def evaluate(p):
            return evaluate_a(p, gx, g_rowsum, adj)

        if jit_loop:
            # whole-run lax.scan: one device dispatch (see train/loop.py)
            # step_a / evaluate_a are reused directly: nested jit inlines
            # under trace, so the two loop flavors cannot diverge.
            @jax.jit
            def run_all(c0, zz, rs, aa, yl, idx_tr, idx_v):
                def body(carry, _):
                    p, o, r, best_p, best_acc = carry
                    r, rr = jax.random.split(r)
                    p, o, loss = step_a(p, o, zz, rs, aa, yl, idx_tr, rr)
                    if idx_val is not None:
                        logits = evaluate_a(p, zz, rs, aa)
                        acc = accuracy(jax.nn.log_softmax(logits, 1), yl,
                                       idx_v)
                        take = acc > best_acc
                        best_acc = jnp.where(take, acc, best_acc)
                        best_p = jax.tree_util.tree_map(
                            lambda b, n: jnp.where(take, n, b), best_p, p)
                    else:
                        acc = jnp.float32(jnp.nan)
                    return (p, o, r, best_p, best_acc), (loss, acc)

                return jax.lax.scan(body, c0, None, length=num_epochs)

            c0 = (self.params, opt_state, rng, self.params,
                  jnp.float32(-jnp.inf))
            idx_v = idx_val if idx_val is not None else jnp.zeros(
                1, jnp.int32)
            with self.timers("fit_scan").d as t:
                carry, (losses, accs) = run_all(c0, gx, g_rowsum, adj,
                                                labels, idx_train, idx_v)
                t.fence(losses)
            self.params, opt_state, rng, best_params, best_acc = carry
            if idx_val is not None:
                self.best_acc = float(best_acc)
            if verbose:
                for e in range(0, num_epochs, print_freq):
                    msg = (f"Epoch {e}/{num_epochs} "
                           f"loss {float(np.asarray(losses)[e]):.4f}")
                    if idx_val is not None:
                        msg += f" val_acc {float(np.asarray(accs)[e]):.4f}"
                    print(msg)
        else:
            best_params = self.params
            for epoch in range(num_epochs):
                rng, r = jax.random.split(rng)
                with self.timers("epoch").d as t:
                    self.params, opt_state, loss = step(self.params,
                                                        opt_state, r)
                    t.fence(loss)
                if idx_val is not None:
                    logits = evaluate(self.params)
                    acc = float(accuracy(jax.nn.log_softmax(logits, 1),
                                         labels, idx_val))
                    if acc > self.best_acc:
                        self.best_acc = acc
                        best_params = self.params
                if verbose and epoch % print_freq == 0:
                    msg = f"Epoch {epoch}/{num_epochs} loss {float(loss):.4f}"
                    if idx_val is not None:
                        msg += f" val_acc {acc:.4f} best {self.best_acc:.4f}"
                    print(msg)
        self.opt_state = opt_state
        self._final_params = self.params
        self._final_rng = rng
        self._epochs_done += num_epochs
        if idx_val is not None:
            self.params = best_params
        self.output = evaluate(self.params)
        self._labels = labels
        return self

    def save_state(self, path: str) -> None:
        """Save the FULL resumable training state (last-iterate params +
        optimizer/schedule state + epoch count); continue with
        ``fit(..., resume_from=path)``."""
        from gcn_tpu.utils.checkpoint import save_training_state

        assert getattr(self, "opt_state", None) is not None, \
            "nothing to save: call fit() first"
        save_training_state(path, self._final_params, self.opt_state,
                            self._epochs_done,
                            rng=getattr(self, "_final_rng", None))

    def test(self, idx_test, verbose: bool = True):
        idx = jnp.asarray(np.asarray(idx_test), dtype=jnp.int32)
        acc = float(accuracy(jax.nn.log_softmax(self.output, 1),
                             self._labels, idx))
        if verbose:
            print(f"HGNN test accuracy: {acc:.4f}")
        return acc
