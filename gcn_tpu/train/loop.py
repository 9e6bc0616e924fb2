"""GCN training loops.

Re-implements the reference's three fit modes (gcn1.py:180-301) as one loop
driver around a jitted train step:

  * no validation      — _train_without_val (gcn1.py:180-217)
  * with validation    — best-val-snapshot  (gcn1.py:219-256)
  * early stopping     — patience on val loss (gcn1.py:258-301)

The step (forward + loss + backward + Adam update) is a single jitted
function; fwd/bwd wall times are measured device-fenced per iteration, with
the reference's warmup convention (timers reset after iteration 10,
gcn5.py:273-291) available via ``warmup``.

By default the whole training loop compiles as one ``lax.scan``
(``jit_loop=True``): best-val / early-stopping state (best-params snapshot,
patience counter) is carried through the scan with tree-select updates, so
training runs in a single device dispatch — the idiomatic TPU shape, and a
large win wherever per-call dispatch latency is non-trivial. Pass
``jit_loop=False`` for the per-iteration loop with the reference's
per-step device-fenced timing printout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.train.metrics import accuracy, masked_nll
from gcn_tpu.utils.timers import Timers


@dataclasses.dataclass
class TrainResult:
    params: object
    log_probs: jnp.ndarray  # final (or best) full-graph eval-mode outputs
    timers: Timers
    history: list
    best_iter: int = -1
    opt_state: object = None  # final optimizer state (for resume)
    final_params: object = None  # last-iterate params (vs best snapshot)
    final_rng: object = None  # post-run rng (resume continues the stream)
    # number of EXECUTED optimizer updates (== rng splits consumed):
    # after early stopping this is < train_iters, and resume bookkeeping
    # must use it — not len(history) — so the two loop flavors restart
    # from identical (iteration, rng-stream) positions
    iters_run: int = 0


def fit_gcn(
    params,
    tx,
    forward: Callable,  # forward(params, fdata, train, rng) -> log_probs
    labels: jnp.ndarray,
    idx_train: jnp.ndarray,
    idx_val: Optional[jnp.ndarray] = None,
    *,
    forward_data=(),  # pytree passed to forward as a JIT ARGUMENT — large
                      # arrays (features, adjacency) must ride here, not in
                      # the forward closure, or they embed in the program
                      # as constants (oversized executables at big-graph
                      # scale)
    train_iters: int = 200,
    mode: str = "auto",  # auto | no_val | val | early_stop
    patience: int = 500,
    rng: Optional[jax.Array] = None,
    verbose: bool = False,
    warmup: int = 10,
    timers: Optional[Timers] = None,
    jit_loop: bool = True,
    opt_state=None,  # resume from a checkpointed optimizer state
    start_iter: int = 0,  # resume offset for history/best_iter records
) -> TrainResult:
    if mode == "auto":
        mode = "no_val" if idx_val is None else "val"
    if mode != "no_val" and idx_val is None:
        raise ValueError(f"mode {mode!r} requires idx_val")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    timers = timers or Timers()
    labels = jnp.asarray(labels)
    idx_train = jnp.asarray(idx_train)
    if idx_val is not None:
        idx_val = jnp.asarray(idx_val)

    if opt_state is None:
        opt_state = tx.init(params)

    def loss_fn(p, fd, yl, idx, step_rng):
        lp = forward(p, fd, True, step_rng)
        return masked_nll(lp, yl, idx)

    @jax.jit
    def train_step_a(p, o, fd, yl, idx, step_rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, fd, yl, idx, step_rng)
        updates, o = tx.update(grads, o, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return p, o, loss

    @jax.jit
    def eval_step_a(p, fd):
        return forward(p, fd, False, rng)

    if jit_loop:
        return _fit_scanned(params, opt_state, train_step_a, eval_step_a,
                            labels, idx_train, idx_val, forward_data,
                            train_iters=train_iters,
                            mode=mode, patience=patience, rng=rng,
                            verbose=verbose, timers=timers,
                            start_iter=start_iter)

    def train_step(p, o, step_rng):
        return train_step_a(p, o, forward_data, labels, idx_train, step_rng)

    def eval_step(p):
        return eval_step_a(p, forward_data)

    best_params, best_lp = params, None
    best_loss_val = jnp.inf
    best_acc_val = -jnp.inf
    best_iter = -1
    patience_left = patience
    history = []

    for i in range(train_iters):
        if i == warmup:
            timers.reset("step")
        rng, step_rng = jax.random.split(rng)
        with timers("step").d as t:
            params, opt_state, loss = train_step(params, opt_state, step_rng)
            t.fence(loss)
        loss = float(loss)
        rec = {"iter": start_iter + i, "loss_train": loss}

        if mode in ("val", "early_stop"):
            lp = eval_step(params)
            loss_val = float(masked_nll(lp, labels, idx_val))
            acc_val = float(accuracy(lp, labels, idx_val))
            rec.update(loss_val=loss_val, acc_val=acc_val)
            if mode == "val":
                # Track both best-val-loss and best-val-acc snapshots, the
                # later improvement winning — gcn1.py:239-254 semantics.
                if loss_val < best_loss_val:
                    best_loss_val = loss_val
                    best_params, best_lp = params, lp
                    best_iter = start_iter + i
                if acc_val > best_acc_val:
                    best_acc_val = acc_val
                    best_params, best_lp = params, lp
                    best_iter = start_iter + i
            else:  # early_stop: patience on val loss (gcn1.py:277-292)
                if loss_val < best_loss_val:
                    best_loss_val = loss_val
                    best_params, best_lp = params, lp
                    best_iter = start_iter + i
                    patience_left = patience
                else:
                    patience_left -= 1
                if i > patience and patience_left <= 0:
                    history.append(rec)
                    if verbose:
                        print(f"=== early stopping at iteration {i}, "
                              f"best val loss {best_loss_val:.4f} ===")
                    break
        history.append(rec)
        if verbose and i % 10 == 0:
            msg = f"Epoch {i:4d}, training loss: {loss:.6f}"
            if "loss_val" in rec:
                msg += f", val loss: {rec['loss_val']:.6f}, val acc: {rec['acc_val']:.4f}"
            print(msg)

    if mode == "no_val":
        best_params = params
        best_lp = eval_step(params)
        best_iter = start_iter + train_iters - 1
    return TrainResult(params=best_params, log_probs=best_lp, timers=timers,
                       history=history, best_iter=best_iter,
                       opt_state=opt_state, final_params=params,
                       final_rng=rng, iters_run=len(history))


def _fit_scanned(params, opt_state, train_step_a, eval_step_a, labels,
                 idx_train, idx_val, forward_data, *, train_iters, mode,
                 patience, rng, verbose, timers, start_iter=0):
    """Whole-training-run lax.scan: one device dispatch for the full loop.

    Best-val snapshots are tree-selects on the scan carry; early stopping
    becomes a pass-through guard (stopped iterations are cheap cond
    branches — the reference semantics, gcn1.py:277-292, with a compiled
    loop). All graph-sized arrays (forward_data, labels, index sets) enter
    as jit ARGUMENTS so the compiled program carries no large constants.
    The per-iteration step/eval functions are reused directly — nested jit
    inlines under trace — so the two loop flavors cannot diverge.
    """
    track_val = mode in ("val", "early_stop")
    idx_val_a = idx_val if idx_val is not None else jnp.zeros(1, jnp.int32)

    def body_args(fd, yl, idx_tr, idx_v):
        def val_metrics(p):
            lp = eval_step_a(p, fd)
            return (masked_nll(lp, yl, idx_v), accuracy(lp, yl, idx_v))

        def train_step(p, o, step_rng):
            return train_step_a(p, o, fd, yl, idx_tr, step_rng)

        return val_metrics, train_step

    def body_fn(val_metrics, train_step, carry, it):
        # ``it`` is the LOCAL loop index (matching the python flavor's
        # ``i``); global iteration = start_iter + it, used only for
        # best_iter records.
        (p, o, r, best_p, best_loss, best_acc, best_it, pat, stop,
         n_exec) = carry
        # split only on executed iterations so a resumed run continues
        # the rng stream from the same position in either loop flavor
        r, step_rng = jax.lax.cond(
            stop, lambda rr: (rr, rr),
            lambda rr: tuple(jax.random.split(rr)), r)
        n_exec = n_exec + jnp.where(stop, 0, 1).astype(n_exec.dtype)

        def run(_):
            p2, o2, loss = train_step(p, o, step_rng)
            return p2, o2, loss

        def skip(_):
            return p, o, jnp.float32(jnp.nan)

        p2, o2, loss = jax.lax.cond(stop, skip, run, None)

        if track_val:
            loss_val, acc_val = val_metrics(p2)
            if mode == "val":
                # best-val-loss then best-val-acc snapshots, later
                # improvement winning (gcn1.py:239-254)
                take = jnp.logical_and(jnp.logical_not(stop),
                                       loss_val < best_loss)
                best_loss = jnp.where(take, loss_val, best_loss)
                best_p = jax.tree_util.tree_map(
                    lambda b, n: jnp.where(take, n, b), best_p, p2)
                best_it = jnp.where(take, start_iter + it, best_it)
                take2 = jnp.logical_and(jnp.logical_not(stop),
                                        acc_val > best_acc)
                best_acc = jnp.where(take2, acc_val, best_acc)
                best_p = jax.tree_util.tree_map(
                    lambda b, n: jnp.where(take2, n, b), best_p, p2)
                best_it = jnp.where(take2, start_iter + it, best_it)
            else:  # early_stop: patience on val loss (gcn1.py:277-292)
                improved = jnp.logical_and(jnp.logical_not(stop),
                                           loss_val < best_loss)
                best_loss = jnp.where(improved, loss_val, best_loss)
                best_p = jax.tree_util.tree_map(
                    lambda b, n: jnp.where(improved, n, b), best_p, p2)
                best_it = jnp.where(improved, start_iter + it, best_it)
                pat = jnp.where(improved, patience,
                                jnp.where(stop, pat, pat - 1))
                # warmup guard on the LOCAL index, exactly like the
                # python flavor's ``i > patience`` (after resume with
                # start_iter > patience a global-index guard would fire
                # immediately and the two flavors would diverge)
                stop = jnp.logical_or(
                    stop, jnp.logical_and(it > patience, pat <= 0))
        else:
            loss_val = acc_val = jnp.float32(jnp.nan)

        out = (loss, loss_val, acc_val)
        return (p2, o2, r, best_p, best_loss, best_acc, best_it, pat,
                stop, n_exec), out

    carry0 = (params, opt_state, rng, params, jnp.float32(jnp.inf),
              jnp.float32(-jnp.inf), jnp.int32(-1), jnp.int32(patience),
              jnp.bool_(False), jnp.int32(0))

    @jax.jit
    def run_all(c0, fd, yl, idx_tr, idx_v):
        val_metrics, train_step = body_args(fd, yl, idx_tr, idx_v)
        body = functools.partial(body_fn, val_metrics, train_step)
        return jax.lax.scan(body, c0, jnp.arange(train_iters))

    with timers("fit_scan").d as t:
        carry, (losses, losses_val, accs_val) = run_all(
            carry0, forward_data, labels, idx_train, idx_val_a)
        t.fence(losses)
    (p_fin, o_fin, r_fin, best_p, best_loss, _, best_it, _,
     stopped, n_exec) = carry

    losses = np.asarray(losses)
    n_exec = int(n_exec)  # executed updates (< train_iters if stopped)
    history = []
    for i in range(n_exec):
        rec = {"iter": start_iter + i, "loss_train": float(losses[i])}
        if track_val:
            rec["loss_val"] = float(np.asarray(losses_val)[i])
            rec["acc_val"] = float(np.asarray(accs_val)[i])
        history.append(rec)
        if verbose and i % 10 == 0:
            msg = f"Epoch {i:4d}, training loss: {rec['loss_train']:.6f}"
            if track_val:
                msg += (f", val loss: {rec['loss_val']:.6f}"
                        f", val acc: {rec['acc_val']:.4f}")
            print(msg)
    if verbose and bool(stopped):
        print(f"=== early stopping at iteration {len(history)}, "
              f"best val loss {float(best_loss):.4f} ===")

    if mode == "no_val":
        best_p, best_it = p_fin, start_iter + train_iters - 1
    best_lp = eval_step_a(best_p, forward_data)
    return TrainResult(params=best_p, log_probs=best_lp, timers=timers,
                       history=history, best_iter=int(best_it),
                       opt_state=o_fin, final_params=p_fin,
                       final_rng=r_fin, iters_run=n_exec)
