"""Checkpoint / resume for solver-state PyTrees.

The reference has no persistence; its resumable state IS the warm start
(``previous_solution_`` kept across ``Step`` calls,
``/root/reference/optimization/optimization.hpp:83-89,107``), externally
settable via ``SetPreviousSolution``/``Reset``. Here that state is an
explicit PyTree (``MPCState``, plant state, whole batched/sharded sweeps),
so checkpointing is a generic save/load of array leaves keyed by tree path —
a 100k-scenario receding-horizon sweep resumes exactly where it stopped.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state"]

_SEP = "/"


def _leaf_key(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return _SEP.join(parts) if parts else "_root"


def save_state(path: str, tree: Any) -> None:
    """Persist a PyTree of arrays to ``.npz``, keyed by tree path.

    Sharded arrays are gathered to host; callers on multi-host meshes should
    save per-process shards or use orbax for async distributed checkpoints.
    """
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {}
    for p, leaf in leaves:
        key = _leaf_key(p)
        if key in payload:
            raise ValueError(f"duplicate checkpoint key {key!r}")
        payload[key] = np.asarray(leaf)
    np.savez(path, **payload)


def load_state(path: str, like: Any) -> Any:
    """Restore a PyTree saved by :func:`save_state` into the structure (and
    dtypes/shardings left to the caller) of ``like``."""
    with np.load(path) as data:
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for p, ref_leaf in paths_and_leaves:
            key = _leaf_key(p)
            if key not in data:
                raise KeyError(
                    f"checkpoint {path} missing leaf {key!r}; "
                    f"has {sorted(data.keys())}"
                )
            value = data[key]
            ref = np.asarray(ref_leaf)
            if value.shape != ref.shape:
                raise ValueError(
                    f"leaf {key!r} shape {value.shape} != expected {ref.shape}"
                )
            leaves.append(value.astype(ref.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)
