"""Map/state checkpointing — a capability the reference entirely lacks
(SURVEY.md §5: "Checkpoint/resume: none"); required here for long sequences
and the multi-host configurations.

The whole `VOState` is one pytree of arrays, so checkpointing is a single
orbax save/restore; `save_state`/`load_state` wrap it with the frame-handler
bookkeeping (stage, counters) needed for exact resume.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_state(path: str, vo, extra: dict | None = None) -> None:
    """Save a VOState pytree (+ host metadata) to a directory."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(vo)
    np.savez(os.path.join(path, "arrays.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n_leaves": len(flat), "extra": extra or {}}, f)


def load_state(path: str, vo_like):
    """Restore into the structure of `vo_like` (same config/shapes).
    Returns (vo, extra)."""
    data = np.load(os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    flat_like, treedef = jax.tree_util.tree_flatten(vo_like)
    assert meta["n_leaves"] == len(flat_like), "checkpoint/config mismatch"
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
              for i in range(len(flat_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta["extra"]


def save_handler(path: str, handler) -> None:
    """Checkpoint a FrameHandler (arenas + stage machine)."""
    save_state(path, handler.vo, extra={
        "stage": handler.stage,
        "n_fail": handler._n_fail,
    })


def load_handler(path: str, handler) -> None:
    vo, extra = load_state(path, handler.vo)
    handler.vo = vo
    handler.stage = int(extra["stage"])
    handler._n_fail = int(extra["n_fail"])
