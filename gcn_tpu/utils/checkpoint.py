"""Parameter checkpointing.

The reference keeps best weights in memory via ``deepcopy(state_dict())``
(gcn1.py:247-256, pyhgnn/train.py:107-109) and has a vestigial
``torch.save``/``torch.load`` path (profiling_gcn.py:165-170). Here:
a flat-npz format — pytree leaves keyed by their tree path — which is
dependency-free, plus in-memory snapshot helpers.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

_SEP = "//"


def _npz_path(path: str) -> str:
    # np.savez appends ".npz" to suffix-less paths; normalize on BOTH the
    # save and load sides so save("model.ckpt") / load("model.ckpt") agree.
    return path if path.endswith(".npz") else path + ".npz"


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str, params: Any) -> None:
    """Save a pytree of arrays to ``path`` (npz, keys = tree paths)."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params(path: str, like: Any):
    """Load into the structure of ``like`` (shape/dtype validated)."""
    with np.load(_npz_path(path)) as f:
        stored = dict(f)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path_elems, leaf in leaves_with_path:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_elems)
        if key not in stored:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        arr = stored[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint shape mismatch for {key!r}: "
                f"{arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def snapshot(params):
    """In-memory copy (the deepcopy(state_dict()) analogue — host-side so
    device buffers are not pinned)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), params)
