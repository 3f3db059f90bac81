"""Checkpoint / resume.

The reference saves ``[actor_state, disc_state, i_update, elapsed]`` to one
``gail_model.pt`` every update (``tools/learn.py:290-291``) but drops
optimizer state, RNG, and env/curriculum state. Here the FULL LearnerState
pytree round-trips (params, both optimizers, RNG keys, env states including
the spawn-resume curriculum, update counter), per SURVEY §5's checkpoint
plan. Orbax handles the device arrays.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _elide_empty(tree):
    """orbax refuses zero-size arrays (e.g. traffic buffers with 0 NPCs);
    swap them for a scalar placeholder and restore from the template."""
    return jax.tree.map(
        lambda a: jnp.zeros(()) if getattr(a, "size", 1) == 0 else a, tree
    )


def _restore_empty(tree, template):
    return jax.tree.map(
        lambda a, t: t if getattr(t, "size", 1) == 0 else a, tree, template
    )


def save_checkpoint(path: str, state: Any, elapsed: float = 0.0) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path, {"state": _elide_empty(state), "elapsed": elapsed}, force=True
    )
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template_state: Any):
    """Returns (state, elapsed). ``template_state`` supplies structure,
    shapes and shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path, {"state": _elide_empty(template_state), "elapsed": 0.0}
    )
    return _restore_empty(restored["state"], template_state), restored[
        "elapsed"
    ]


def prune_checkpoints(directory: str, keep: int = 2) -> None:
    """Delete all but the newest ``keep`` ``update_*`` checkpoints (the
    reference overwrites one ``gail_model.pt``; we keep a short history plus
    any non-``update_*`` dirs like ``best``)."""
    import shutil

    if not os.path.isdir(directory):
        return
    steps = sorted(
        (
            d for d in os.listdir(directory)
            if d.startswith("update_")
            and os.path.isdir(os.path.join(directory, d))
        ),
        key=lambda d: int(d.split("_")[1]),
    )
    for d in steps[:-keep] if keep > 0 else steps:
        shutil.rmtree(os.path.join(directory, d), ignore_errors=True)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = [
        d for d in os.listdir(directory)
        if d.startswith("update_") and
        os.path.isdir(os.path.join(directory, d))
    ]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split("_")[1]))
    return os.path.join(directory, best)
