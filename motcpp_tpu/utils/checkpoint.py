"""Tracker-state checkpoint / resume.

The reference keeps tracker state in memory only — ``reset()`` is the
whole lifecycle (reference: src/tracker.cpp:48-56; SURVEY.md §5 flags
checkpointing as a worthwhile TPU-build addition). Because every tracker
state here is a NamedTuple pytree of arrays, checkpointing is exact and
trivial: orbax for directory checkpoints (production path), or a
single-file ``.npz`` fallback.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_state(state, path) -> None:
    """Save a tracker state pytree. ``.npz`` suffix -> single file;
    otherwise an orbax directory checkpoint."""
    path = Path(path)
    if path.suffix == ".npz":
        leaves, _ = jax.tree_util.tree_flatten(state)
        np.savez(
            path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
        )
        return
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path.resolve(), state, force=True)


def load_state(template, path):
    """Restore a state saved with :func:`save_state`; ``template`` is any
    state with the target structure (e.g. ``init_fn()``)."""
    path = Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = [
            np.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
        import jax.numpy as jnp

        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(l) for l in new_leaves]
        )
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(path.resolve(), item=template)
    return restored


def save_tracker(tracker, path) -> None:
    """Checkpoint a host-facing tracker's live state."""
    if tracker._state is None:
        raise ValueError("tracker has no state yet (no update() calls)")
    save_state(tracker._state, path)


def load_tracker(tracker, path) -> None:
    """Restore a host-facing tracker's live state in place."""
    template = tracker._state if tracker._state is not None else tracker._init_state()
    tracker._state = load_state(template, path)
