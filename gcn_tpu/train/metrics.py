"""Loss and evaluation metrics.

``masked_nll`` + ``accuracy`` reproduce F.nll_loss on log_softmax outputs and
utils.accuracy (pygcn/gcnio/util/utils.py:214-220).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_nll(log_probs: jnp.ndarray, labels: jnp.ndarray,
               idx: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood over the rows selected by ``idx``."""
    lp = jnp.take(log_probs, idx, axis=0)
    y = jnp.take(labels, idx, axis=0)
    picked = jnp.take_along_axis(lp, y[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def accuracy(log_probs: jnp.ndarray, labels: jnp.ndarray,
             idx: jnp.ndarray | None = None) -> jnp.ndarray:
    if idx is not None:
        log_probs = jnp.take(log_probs, idx, axis=0)
        labels = jnp.take(labels, idx, axis=0)
    pred = jnp.argmax(log_probs, axis=1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def micro_f1(pred: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Micro-averaged F1 for single-label predictions (== accuracy)."""
    return jnp.mean((pred == labels).astype(jnp.float32))
