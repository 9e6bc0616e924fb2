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


def save_training_state(path: str, params: Any, opt_state: Any,
                        iteration: int) -> None:
    """Full mid-training checkpoint: parameters + optimizer state +
    iteration counter in one npz (keys namespaced ``params//`` /
    ``opt//``). The reference only keeps best weights in memory
    (gcn1.py:247-256); resumable training is a production necessity."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {f"params{_SEP}{k}": v for k, v in _flatten(params).items()}
    flat.update({f"opt{_SEP}{k}": v
                 for k, v in _flatten(opt_state).items()})
    flat["__iteration__"] = np.asarray(iteration, dtype=np.int64)
    np.savez(path, **flat)


def load_training_state(path: str, params_like: Any, opt_state_like: Any):
    """-> (params, opt_state, iteration); shapes validated against the
    ``*_like`` structures (e.g. init params + tx.init(params))."""
    path = _npz_path(path)
    with np.load(path) as f:
        stored = dict(f)
    it = int(stored.pop("__iteration__"))

    def restore(like, prefix):
        sub = {k[len(prefix):]: v for k, v in stored.items()
               if k.startswith(prefix)}
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(
            like)
        new = []
        for path_elems, leaf in leaves_with_path:
            key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path_elems)
            if key not in sub:
                raise KeyError(f"checkpoint missing {prefix}{key!r}")
            arr = sub[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(
                    f"checkpoint shape mismatch for {prefix}{key!r}: "
                    f"{arr.shape} vs {np.shape(leaf)}")
            new.append(arr.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, new)

    return (restore(params_like, f"params{_SEP}"),
            restore(opt_state_like, f"opt{_SEP}"), it)


def snapshot(params):
    """In-memory copy (the deepcopy(state_dict()) analogue — host-side so
    device buffers are not pinned)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), params)
