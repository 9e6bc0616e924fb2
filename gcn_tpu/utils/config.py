"""YAML config system with the reference's custom tags.

Mirrors pyhgnn/config/config.py:6-43: ``!join`` joins path segments with the
OS separator, ``!concat`` string-concatenates, and result/checkpoint
directories are auto-created while the data root is only validated.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict

import yaml


class _TagLoader(yaml.SafeLoader):
    pass


def _join(loader, node):
    return os.path.sep.join(str(s) for s in loader.construct_sequence(node))


def _concat(loader, node):
    return "".join(str(s) for s in loader.construct_sequence(node))


_TagLoader.add_constructor("!join", _join)
_TagLoader.add_constructor("!concat", _concat)


def check_dir(folder: str, mk_dir: bool = True) -> None:
    if not osp.exists(folder):
        if mk_dir:
            os.makedirs(folder, exist_ok=True)
        else:
            raise FileNotFoundError(f"required directory missing: {folder}")


def get_config(path: str, *, make_dirs: bool = True) -> Dict[str, Any]:
    """Load a YAML config with !join/!concat tags; create result dirs."""
    with open(path) as f:
        cfg = yaml.load(f, Loader=_TagLoader)
    if make_dirs:
        for key in ("result_root", "ckpt_folder", "result_sub_folder"):
            if cfg.get(key):
                check_dir(cfg[key], mk_dir=True)
    return cfg
