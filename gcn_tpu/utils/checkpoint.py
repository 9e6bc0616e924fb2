"""Parameter checkpointing.

The reference keeps best weights in memory via ``deepcopy(state_dict())``
(gcn1.py:247-256, pyhgnn/train.py:107-109) and has a vestigial
``torch.save``/``torch.load`` path (profiling_gcn.py:165-170). Here:
a flat-npz format — pytree leaves keyed by their tree path — which is
dependency-free, plus in-memory snapshot helpers and FULL training-state
checkpoints (params + optimizer state + iteration + rng) for resumable
training. All writes are atomic (tmp file + rename): an interruption
mid-write can never destroy the previous checkpoint.
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


def _leaf_key(path_elems) -> str:
    return _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path_elems)


def _flatten(params, prefix: str = "") -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[prefix + _leaf_key(path)] = np.asarray(leaf)
    return flat


def _atomic_savez(path: str, flat: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"  # .npz suffix: savez writes exactly this name
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def _restore(stored: dict, like: Any, prefix: str = ""):
    """Rebuild the structure of ``like`` from stored arrays
    (shape-validated, dtypes matched)."""
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path_elems, leaf in leaves_with_path:
        key = prefix + _leaf_key(path_elems)
        if key not in stored:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        arr = stored[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint shape mismatch for {key!r}: "
                f"{arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_params(path: str, params: Any) -> None:
    """Save a pytree of arrays to ``path`` (npz, keys = tree paths)."""
    _atomic_savez(_npz_path(path), _flatten(params))


def load_params(path: str, like: Any):
    """Load into the structure of ``like`` (shape/dtype validated)."""
    with np.load(_npz_path(path)) as f:
        stored = dict(f)
    return _restore(stored, like)


def save_training_state(path: str, params: Any, opt_state: Any,
                        iteration: int, rng=None) -> None:
    """Full mid-training checkpoint: parameters + optimizer state +
    iteration counter (+ the training rng, so stochastic layers resume
    the same stream) in one npz with namespaced keys. The reference only
    keeps best weights in memory (gcn1.py:247-256); resumable training
    is a production necessity."""
    flat = _flatten(params, f"params{_SEP}")
    flat.update(_flatten(opt_state, f"opt{_SEP}"))
    flat["__iteration__"] = np.asarray(iteration, dtype=np.int64)
    if rng is not None:
        flat["__rng__"] = np.asarray(rng)
    _atomic_savez(_npz_path(path), flat)


def load_training_state(path: str, params_like: Any, opt_state_like: Any):
    """-> (params, opt_state, iteration, rng_or_None); shapes validated
    against the ``*_like`` structures (e.g. init params +
    tx.init(params))."""
    with np.load(_npz_path(path)) as f:
        stored = dict(f)
    it = int(stored.pop("__iteration__"))
    rng = stored.pop("__rng__", None)
    if rng is not None:
        rng = jax.numpy.asarray(rng)
    return (_restore(stored, params_like, f"params{_SEP}"),
            _restore(stored, opt_state_like, f"opt{_SEP}"), it, rng)


def snapshot(params):
    """In-memory copy (the deepcopy(state_dict()) analogue — host-side so
    device buffers are not pinned)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), params)
