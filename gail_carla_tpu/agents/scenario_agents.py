"""Scenario-actor agents — ports of ``carla_gym/core/task_actor/
scenario_actor/agents/``.

``BasicAgent`` capability is `agents/autopilot.py` (the expert);
``ConstantSpeedAgent`` is below. The handler that drives scenario vehicles
along task routes each tick (``scenario_actor_handler.py:6-50``) lives in
``sim/traffic.py``: the last ``cfg.n_scenario_actors`` NPC slots run the
same LocalPlanner/PID stack on route-keyed ``scene.sa_patrol`` polylines
(``reset_traffic``/``step_traffic``), so there is no separate handler
object here.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.agents.controllers import PIDState, pid_step
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
