"""Reward handlers.

- ``delta_completion``: what the training loop actually optimises in the
  reference (CarlaEnv recomputes reward = Δ(route_completed/route_length),
  ``carla_env.py:148-153``) — computed inline in sim/env.py.
- ``valeo_action``: the dense shaped reward the reference env computes
  underneath (``.../ego_vehicle/reward/valeo_action.py``): r_speed with a
  hazard-limited desired speed + lateral/heading penalties + steer-jump
  penalty + terminal reward.

Hazard detectors port ``carla_gym/utils/hazard_actor.py`` (lbc_* variants,
the ones the Valeo reward/terminal use) over the traffic arrays; with zero
NPCs they report no hazard, matching the reference's zeroed zombie counts
(``leaderboard_env.py:34-49``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.state import TrafficState
from gail_carla_tpu.sim.transforms import cast_angle, vec_global_to_ref

MAX_SPEED = 6.0  # valeo_action.py:22


def hazard_vehicle(
    traffic: TrafficState, ego_xy, ego_yaw,
    proximity_threshold: float = 9.5, distance_threshold: float = 15.0,
):
    """lbc_hazard_vehicle (hazard_actor.py:16-29): nearest same-heading
    vehicle within a 45° cone ahead. Returns (found, dist)."""
    rel = traffic.veh.xy - ego_xy[None, :]
    local = vec_global_to_ref(rel, ego_yaw)
    dist = jnp.linalg.norm(local, axis=-1)
    yaw_diff = jnp.abs(cast_angle(traffic.veh.yaw - ego_yaw))
    same_heading = yaw_diff <= jnp.deg2rad(150.0)
    angle = jnp.abs(jnp.arctan2(local[:, 1], local[:, 0]))
    ahead = (angle < jnp.deg2rad(45.0)) | (dist < 1e-3)
    hit = (
        same_heading & ahead
        & (dist < proximity_threshold) & (dist < distance_threshold)
    )
    if dist.shape[0] == 0:
        return jnp.zeros((), bool), jnp.zeros(())
    d = jnp.min(jnp.where(hit, dist, 1e9))
    return jnp.any(hit), jnp.where(jnp.any(hit), d, 0.0)


def hazard_walker(
    traffic: TrafficState, ego_xy, ego_yaw,
    proximity_threshold: float = 9.5,
):
    """lbc_hazard_walker (hazard_actor.py:32-46): distance-dependent cone."""
    rel = traffic.walker_xy - ego_xy[None, :]
    local = vec_global_to_ref(rel, ego_yaw)
    dist = jnp.linalg.norm(local, axis=-1)
    degree = 162.0 / (jnp.clip(dist, 1.5, 10.5) + 0.3)
    angle = jnp.abs(jnp.rad2deg(jnp.arctan2(local[:, 1], local[:, 0])))
    hit = ((angle < degree) | (dist < 1e-3)) & (dist < proximity_threshold)
    if dist.shape[0] == 0:
        return jnp.zeros((), bool), jnp.zeros(())
    d = jnp.min(jnp.where(hit, dist, 1e9))
    return jnp.any(hit), jnp.where(jnp.any(hit), d, 0.0)


class ValeoInputs(NamedTuple):
    ego_xy: jnp.ndarray
    ego_yaw: jnp.ndarray
    ego_speed: jnp.ndarray
    steer: jnp.ndarray
    last_steer: jnp.ndarray
    route_tf_xy: jnp.ndarray   # get_route_transform location
    route_tf_yaw: jnp.ndarray
    light_state: jnp.ndarray   # affecting light state (-1 none)
    light_dist: jnp.ndarray    # distance to its stop line
    stop_dist: jnp.ndarray     # distance to active stop sign (inf none)
    has_stop: jnp.ndarray      # bool: active, un-completed stop sign
    terminal_reward: jnp.ndarray


def valeo_action_reward(traffic: TrafficState, inp: ValeoInputs):
    """valeo_action.py:26-132. Returns (reward, desired_speed)."""
    # r_action: steer jump penalty (:33-37)
    r_action = jnp.where(
        jnp.abs(inp.steer - inp.last_steer) > 0.01, -0.1, 0.0
    )

    # desired speed modulation (:49-75)
    veh_found, veh_dist = hazard_vehicle(traffic, inp.ego_xy, inp.ego_yaw)
    ped_found, ped_dist = hazard_walker(traffic, inp.ego_xy, inp.ego_yaw)

    def ramp(dist, margin):
        return MAX_SPEED * jnp.clip(
            jnp.maximum(0.0, dist - margin), 0.0, 5.0
        ) / 5.0

    spd_veh = jnp.where(veh_found, ramp(veh_dist, 8.0), MAX_SPEED)
    spd_ped = jnp.where(ped_found, ramp(ped_dist, 6.0), MAX_SPEED)
    red_or_yellow = (inp.light_state == signals.RED) | (
        inp.light_state == signals.YELLOW
    )
    spd_rl = jnp.where(red_or_yellow, ramp(inp.light_dist, 5.0), MAX_SPEED)
    spd_stop = jnp.where(inp.has_stop, ramp(inp.stop_dist, 5.0), MAX_SPEED)
    desired = jnp.minimum(
        jnp.minimum(jnp.minimum(spd_veh, spd_ped), spd_rl),
        jnp.minimum(spd_stop, MAX_SPEED),
    )

    r_speed = 1.0 - jnp.abs(inp.ego_speed - desired) / MAX_SPEED

    # r_position: lateral distance to the route transform (:84-93)
    d = inp.ego_xy - inp.route_tf_xy
    right = jnp.stack(
        [-jnp.sin(inp.route_tf_yaw), jnp.cos(inp.route_tf_yaw)]
    )
    lateral = jnp.abs(jnp.sum(right * d))
    r_position = -1.0 * (lateral / 2.0)

    # r_rotation (:95-99)
    r_rotation = -1.0 * jnp.abs(cast_angle(inp.ego_yaw - inp.route_tf_yaw))

    reward = r_speed + r_position + r_rotation + inp.terminal_reward + r_action
    return reward, desired
