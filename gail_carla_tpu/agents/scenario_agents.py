"""Scenario-actor agents — ports of ``carla_gym/core/task_actor/
scenario_actor/agents/``.

``BasicAgent`` capability is `agents/autopilot.py` (the expert). This module
adds the remaining scripted agent and the handler-equivalent for driving a
set of scenario vehicles along task-defined routes each tick
(``scenario_actor_handler.py:6-50``) — used by tasks that ship scripted
adversary vehicles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.agents.autopilot import local_planner_act
from gail_carla_tpu.agents.controllers import (
    AutopilotState, PIDState, pid_step,
)
from gail_carla_tpu.sim.dynamics import VehicleState


@struct.dataclass
class ConstantSpeedState:
    speed_pid: PIDState


def make_constant_speed() -> ConstantSpeedState:
    from gail_carla_tpu.agents.controllers import make_pid

    return ConstantSpeedState(speed_pid=make_pid())


def constant_speed_act(
    state: ConstantSpeedState, ego: VehicleState, target_speed: float
):
    """constant_speed_agent.py:5-29: hold speed with the longitudinal PID,
    steer straight."""
    from gail_carla_tpu.agents.autopilot import LON_PID

    delta = target_speed - ego.speed
    pid, throttle = pid_step(state.speed_pid, delta, *LON_PID)
    action = jnp.stack(
        [jnp.zeros(()), jnp.clip(throttle, 0.0, 1.0)]
    )
    return ConstantSpeedState(speed_pid=pid), action


@struct.dataclass
class ScenarioActors:
    """Batched scripted vehicles with their own routes — the
    ScenarioActorHandler state."""

    veh: VehicleState            # (A,)
    route_id: jnp.ndarray        # (A,) rows into a route family
    head: jnp.ndarray            # (A,)
    ap: AutopilotState           # (A,)
    target_speed: jnp.ndarray    # (A,)


def scenario_tick(route_xy, route_cmd, actors: ScenarioActors):
    """One decision per scenario vehicle (scenario_actor_handler.py:39-43);
    the caller integrates the returned actions with step_vehicle."""
    ap, actions = jax.vmap(
        lambda a, v, r, h, ts: local_planner_act(
            route_xy, route_cmd, a, v, r, h, ts
        )
    )(actors.ap, actors.veh, actors.route_id, actors.head,
      actors.target_speed)
    return actors.replace(ap=ap), actions
