"""Functional 2-layer GCN core.

The pure-function heart shared by every variant of the capability ladder
(reference gcn1..gcn6, SURVEY.md §2b): params pytree + forward function, so it
jits, grads, and shard_maps cleanly. The class wrapper with the reference's
fit/test/predict surface lives in gcn_tpu.models.gcn.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gcn_tpu.models.layers import dropout, graph_conv, init_linear


def init_gcn_params(key, nfeat: int, nhid: int, nclass: int,
                    with_bias: bool = True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "gc1": init_linear(k1, nfeat, nhid, with_bias, dtype),
        "gc2": init_linear(k2, nhid, nclass, with_bias, dtype),
    }


def gcn_forward(
    params,
    x: jnp.ndarray,
    adj1,
    adj2=None,
    *,
    orders: Tuple[str, str] = ("a_xw", "a_xw"),
    dropout_rate: float = 0.5,
    with_relu: bool = True,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns log-probabilities (n, nclass).

    Structure mirrors gcn1.py:103-146: gc1 -> [relu] -> [dropout] -> gc2 ->
    log_softmax; dropout only applies when with_relu is on, matching the
    reference's coupling of the two flags (gcn1.py:131-137).

    adj2 defaults to adj1; a different representation per layer is allowed
    (e.g. layer 1 on the panel/Pallas path at width nhid, layer 2 on COO).
    """
    if adj2 is None:
        adj2 = adj1
    h = graph_conv(params["gc1"], adj1, x, orders[0])
    if with_relu:
        h = jax.nn.relu(h)
        if train:
            if rng is None:
                raise ValueError("training forward needs an rng for dropout")
            h = dropout(rng, h, dropout_rate, train=True)
    h = graph_conv(params["gc2"], adj2, h, orders[1])
    return jax.nn.log_softmax(h, axis=1)
