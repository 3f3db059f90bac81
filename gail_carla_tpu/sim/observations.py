"""Full observation dictionary — parity surface for the reference's
ObsManager family (``carla_gym/core/obs_manager/``), beyond the policy's
hot-path (BEV mask 0 + metrics 4-vector).

Returns the nested dict CarlaMultiAgentEnv's obs carries per hero
(obs_configs in carla_env.py:17-62), computed from WorldState:

- actor_state.speed / velocity / control / route  (.../actor_state/*.py)
- navigation.gnss (gnss/imu/target_gps/command)    (.../navigation/gnss.py)
- navigation.waypoint_plan (next K route steps)    (waypoint_plan.py)
- object_finder.vehicle / pedestrian               (object_finder/*.py)
- birdview (rendered + 15-channel masks) when cfg.full_bev

Not in the training loop — this exists for users porting code that consumed
the reference's obs dicts, for demo export, and for debugging.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.state import WorldState
from gail_carla_tpu.sim.transforms import (
    cast_angle, location_to_gps, vec_global_to_ref,
)


def observe_full(
    scene: StaticScene,
    cfg: EnvConfig,
    state: WorldState,
    k_waypoints: int = 20,      # waypoint_plan 'steps' (carla_env.py:59)
    max_detection: int = 10,    # object_finder configs (valeo_action.py:17)
):
    ego = state.ego
    rid, head = state.route_id, state.head
    speed = jnp.abs(ego.speed)
    vel = ego.vel

    # --- actor_state.speed (speed.py:11-45) ---
    obs_speed = {
        "speed": speed[None],
        "speed_xy": speed[None],
        "forward_speed": ego.speed[None],
    }

    # --- actor_state.velocity (velocity.py:8-43): ego-frame vel/acc ---
    vel_local = vec_global_to_ref(vel, ego.yaw)
    obs_velocity = {
        "vel_xy": vel_local,
        "acc_xy": jnp.zeros(2),       # single-step state keeps no accel
        "ang_z": jnp.zeros(1),
    }

    # --- actor_state.control (control.py:7-37) ---
    obs_control = {
        "throttle": jnp.zeros(1),
        "steer": state.last_steer[None],
        "brake": jnp.zeros(1),
        "gear": jnp.ones(1),
        "speed_limit": jnp.asarray([8.33]),  # 30 km/h town default
    }

    # --- actor_state.route (route.py:8-71) ---
    from gail_carla_tpu.sim.cursor import route_transform

    tf_xy, tf_yaw = route_transform(scene, rid, head, state.last_head)
    d_vec = ego.xy - tf_xy
    right = jnp.stack([-jnp.sin(tf_yaw), jnp.cos(tf_yaw)])
    lateral = jnp.sum(right * d_vec)
    route_locs = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, 5, 2)
    )[0]
    obs_route = {
        "lateral_dist": jnp.abs(lateral)[None],
        "angle_diff": cast_angle(ego.yaw - tf_yaw)[None],
        "route_locs": jax.vmap(
            lambda p: vec_global_to_ref(p - ego.xy, ego.yaw)
        )(route_locs).reshape(-1),
        "dist_remaining": (
            scene.route_len_m[rid]
            - scene.route_s[rid, head]
        )[None],
    }

    # --- navigation.gnss (gnss.py:76-123) ---
    gps = location_to_gps(ego.xy)
    pn = scene.plan_n[rid]
    tgt_idx = jnp.clip(state.plan_idx + 1, 0, pn - 1)
    compass = cast_angle(ego.yaw + jnp.pi / 2.0)  # CARLA compass convention
    obs_gnss = {
        "gnss": jnp.asarray([gps[0], gps[1], 0.0]),
        "imu": jnp.concatenate([jnp.zeros(6), compass[None]]),
        "target_gps": jnp.concatenate(
            [scene.plan_gps[rid, tgt_idx], jnp.zeros(1)]
        ),
        "command": scene.plan_cmd[rid, tgt_idx][None],
    }

    # --- navigation.waypoint_plan (waypoint_plan.py:9-71) ---
    plan_pts = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, k_waypoints, 2)
    )[0]
    plan_cmd = jax.lax.dynamic_slice(
        scene.route_cmd, (rid, head), (1, k_waypoints)
    )[0]
    obs_plan = {
        "location": jax.vmap(
            lambda p: vec_global_to_ref(p - ego.xy, ego.yaw)
        )(plan_pts),
        "command": plan_cmd,
        "road_id": jnp.zeros(k_waypoints, jnp.int32),
        "lane_id": jnp.zeros(k_waypoints, jnp.int32),
        "is_junction": jnp.zeros(k_waypoints, bool),
    }

    # --- object_finder.vehicle / pedestrian (K nearest in ego frame) ---
    def finder(xy, yaw, speed_arr, n_out):
        if xy.shape[0] == 0:
            return {
                "binary_mask": jnp.zeros(n_out, bool),
                "location": jnp.zeros((n_out, 2)),
                "rotation": jnp.zeros((n_out,)),
                "absolute_velocity": jnp.zeros((n_out, 2)),
            }
        local = jax.vmap(
            lambda p: vec_global_to_ref(p - ego.xy, ego.yaw)
        )(xy)
        dist = jnp.linalg.norm(local, axis=-1)
        order = jnp.argsort(dist)[:n_out]
        # tiny top-k gather over <=32 actors — cheap
        sel = lambda a: a[order]  # noqa: E731
        within = sel(dist) < 15.0
        pad = n_out - order.shape[0]
        padf = lambda a: jnp.pad(  # noqa: E731
            a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        )
        vel_g = (
            speed_arr[:, None]
            * jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=1)
        )
        return {
            "binary_mask": padf(within),
            "location": padf(sel(local)),
            "rotation": padf(cast_angle(sel(yaw) - ego.yaw)),
            "absolute_velocity": padf(sel(vel_g)),
        }

    t = state.traffic
    obs_vehicles = finder(
        t.veh.xy, t.veh.yaw, t.veh.speed, max_detection
    )
    obs_walkers = finder(
        t.walker_xy, t.walker_yaw, t.walker_speed, max_detection
    )
    obs_walkers["on_sidewalk"] = jnp.zeros(max_detection, bool)

    obs = {
        "speed": obs_speed,
        "velocity": obs_velocity,
        "control": obs_control,
        "route_plan": obs_plan,
        "route_state": obs_route,
        "gnss": obs_gnss,
        "surrounding_vehicles": obs_vehicles,
        "surrounding_pedestrians": obs_walkers,
    }

    if cfg.full_bev and state.history is not None:
        from gail_carla_tpu.ops.bev_full import render_bev_full

        masks, rendered, col_px = render_bev_full(
            scene, cfg, ego.xy, ego.yaw, rid, head, state.history
        )
        obs["birdview"] = {
            "rendered": rendered,
            "masks": masks,
            "collision_px": col_px,
        }
    return obs
