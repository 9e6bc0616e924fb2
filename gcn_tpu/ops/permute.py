"""Device-side row permutation of dense feature/label arrays.

Equivalent of the reference's permutate.cu (gather B[voMp[new]] -> B[new],
one warp per row, permutate.cu:3-39) — on TPU a single XLA gather. Also
fixes the reference's dead label-permutation path (permutate.cu:17,35
guards label movement with `if(false && ...)` while gcn6.fit remaps the
train indices — SURVEY.md §3.6.1): here labels go through the same op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def permute_rows(x: jnp.ndarray, perm_new_to_old) -> jnp.ndarray:
    """out[new] = x[perm[new]] — differentiable (VJP is the inverse gather)."""
    perm = jnp.asarray(np.asarray(perm_new_to_old), dtype=jnp.int32)
    return jnp.take(x, perm, axis=0)


def inverse_permutation(perm_new_to_old) -> np.ndarray:
    """inv[old] = new, so ``permute_rows(y, inv)`` undoes ``permute_rows``."""
    perm = np.asarray(perm_new_to_old)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


def remap_indices(idx, perm_new_to_old) -> jnp.ndarray:
    """Old-order vertex indices -> new-order (the gcn6.py:255-260
    permutateIdx contract)."""
    inv = inverse_permutation(perm_new_to_old)
    return jnp.asarray(inv[np.asarray(idx)], dtype=jnp.int32)
