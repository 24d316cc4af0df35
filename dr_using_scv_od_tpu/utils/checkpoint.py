"""Checkpoint / resume for long mapping sessions.

The reference has no in-process checkpointing; its per-frame PCD artifact
chain is the implicit restart point (SURVEY.md section 5). Here the
pipeline state (poses, voxel-map sums, cluster tables, track-id counter)
checkpoints explicitly as flat .npz archives - single-host, synchronous,
dependency-free; the SLAM engine (models/engine.py) writes one at a
configurable frame interval and `--resume` restores it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def save(path: str | Path, state: Dict[str, Any]) -> None:
    """Save a pytree dict of arrays."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for k, v in state.items():
        for leaf_path, leaf in _flatten(k, v):
            flat[leaf_path] = np.asarray(leaf)
    np.savez_compressed(str(path) + ".npz" if path.suffix != ".npz"
                        else str(path), **flat)


def load(path: str | Path) -> Dict[str, Any]:
    path = Path(path)
    if path.suffix != ".npz":
        path = Path(str(path) + ".npz")
    data = np.load(path, allow_pickle=False)
    out: Dict[str, Any] = {}
    for k in data.files:
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[k]
    return out


def _flatten(prefix: str, v):
    if isinstance(v, dict):
        for k, sub in v.items():
            yield from _flatten(f"{prefix}/{k}", sub)
    elif hasattr(v, "shape") or np.isscalar(v):
        yield prefix, v
    else:
        leaves, _ = jax.tree.flatten(v)
        for i, leaf in enumerate(leaves):
            yield f"{prefix}/{i}", leaf
