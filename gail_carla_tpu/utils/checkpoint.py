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
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, elapsed: float = 0.0) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": state, "elapsed": elapsed}, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template_state: Any):
    """Returns (state, elapsed). ``template_state`` supplies structure,
    shapes and shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path, {"state": template_state, "elapsed": 0.0}
    )
    return restored["state"], restored["elapsed"]


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
