"""Graph convolution layer primitives (functional).

Numerics match the reference's ``GraphConvolution`` (pygcn/gcn1.py:14-62):
weights shaped (in, out), init U(-1/sqrt(out), 1/sqrt(out)) for both W and b
(gcn1.py:30-38), output ``A (X W) + b``. The alternative contraction order
``(A X) W`` is the reference's ``GraphConvolution2`` (gcn3.py:87-92); which
one is cheaper depends on whether the SpMM runs at width ``in`` or ``out``
(the per-dataset rule of gcn4.py:135-139 — here a dimension comparison).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def init_linear(key, n_in: int, n_out: int, with_bias: bool = True,
                dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    stdv = 1.0 / (n_out ** 0.5)
    wkey, bkey = jax.random.split(key)
    params = {"w": jax.random.uniform(wkey, (n_in, n_out), dtype, -stdv, stdv)}
    if with_bias:
        params["b"] = jax.random.uniform(bkey, (n_out,), dtype, -stdv, stdv)
    return params


def graph_conv(params: Dict[str, jnp.ndarray], adj, x: jnp.ndarray,
               order: str = "a_xw") -> jnp.ndarray:
    """One graph convolution.

    order:
      "a_xw" — A @ (X @ W): SpMM runs at width n_out (GraphConvolution).
      "ax_w" — (A @ X) @ W: SpMM runs at width n_in  (GraphConvolution2).
      "xw"   — X @ W only: aggregation was precomputed upstream (the gcn2
               trick of hoisting A@X for layer 1, gcn2.py:147).
    """
    from gcn_tpu.ops.spmm import spmm

    w = params["w"]
    if order == "a_xw":
        h = spmm(adj, jnp.dot(x, w, preferred_element_type=x.dtype))
    elif order == "ax_w":
        h = jnp.dot(spmm(adj, x), w, preferred_element_type=x.dtype)
    elif order == "xw":
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
    else:
        raise ValueError(f"unknown contraction order {order!r}")
    if "b" in params:
        h = h + params["b"]
    return h


def auto_order(n_in: int, n_out: int) -> str:
    """Pick the contraction order that runs the SpMM at the narrower width.

    Generalizes the reference's hardcoded per-dataset choice (gcn4.py:135-139)
    into the dimension rule that motivates it: SpMM cost ~ nnz * k, so run it
    at k = min(n_in, n_out).
    """
    return "a_xw" if n_out <= n_in else "ax_w"


def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout, matching torch.nn.functional.dropout semantics."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
