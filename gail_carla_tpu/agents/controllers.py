"""PID controllers + LocalPlanner state (leaf module).

Split out of agents/autopilot.py so sim/state.py can embed per-NPC
controller state without an import cycle. Semantics: controller.py:4-29
(window-30 PID) and local_planner.py:22-37 (two PIDs + last_command).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

PID_WINDOW = 30  # controller.py:5



@struct.dataclass
class PIDState:
    """Ring buffer equivalent of controller.py's deque(maxlen=30). Unused
    slots are zero, so summing the whole buffer equals summing the window."""

    buf: jnp.ndarray    # (PID_WINDOW,)
    idx: jnp.ndarray    # () i32
    count: jnp.ndarray  # () i32
    prev: jnp.ndarray   # () f32 previous error


def make_pid() -> PIDState:
    return PIDState(
        buf=jnp.zeros((PID_WINDOW,)),
        idx=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        prev=jnp.zeros(()),
    )


def pid_step(state: PIDState, error, kp, ki, kd, dt: float = 0.1):
    """controller.py:14-29: integral = window sum * dt, derivative from the
    last two samples, both zero until two samples exist."""
    buf = state.buf.at[state.idx].set(error)
    count = jnp.minimum(state.count + 1, PID_WINDOW)
    have2 = count >= 2
    integral = jnp.where(have2, jnp.sum(buf) * dt, 0.0)
    deriv = jnp.where(have2, (error - state.prev) / dt, 0.0)
    out = kp * error + ki * integral + kd * deriv
    new = PIDState(
        buf=buf, idx=(state.idx + 1) % PID_WINDOW, count=count, prev=error
    )
    return new, out


@struct.dataclass
class AutopilotState:
    turn_pid: PIDState
    speed_pid: PIDState
    last_command: jnp.ndarray   # () i32, local_planner.py:37


def make_autopilot() -> AutopilotState:
    return AutopilotState(
        turn_pid=make_pid(),
        speed_pid=make_pid(),
        last_command=jnp.full((), 4, jnp.int32),
    )


