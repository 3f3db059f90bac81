"""Background traffic: zombie vehicles and walkers, fully on device.

The reference spawns N vehicles at spawn points >= 10 m from the ego and
hands them to CARLA's server-side TrafficManager (``carla_gym/core/
zombie_vehicle/zombie_vehicle_handler.py:8-83``); walkers get a
``controller.ai.walker`` with a random nav goal and speed 1-2 m/s
(``zombie_walker_handler.py:7-98``). TPU-native equivalents:

- vehicles: each drives a pre-compiled random lane-graph patrol
  (scene.patrol_*) with the same LocalPlanner/PID stack as the expert, plus
  the TrafficManager's observable behaviours — brake for a lead vehicle and
  for red lights; the patrol loops by teleporting back to its start (the
  reference also teleports zombies, zombie_vehicle.py:4-14);
- walkers: sidewalk following. CARLA's navmesh keeps crowds on sidewalks
  (``controller.ai.walker``). For imported reference towns the scene
  carries REAL sidewalk centrelines (skeletons of the H5 ``sidewalk``
  layer, scene.walk_*), and each walker follows one at offset 0 —
  crossings lerp the offset to scene.walk_cross[path] (the signed lateral
  displacement across the adjacent road, precomputed from the road
  boundary). Procedural towns have no sidewalk masks, so the walker
  follows a lane polyline at ±(half_lane + SIDEWALK_OFFSET) — the
  pavement band just off the road edge — with crossings flipping the
  band's sign.

Everything is vmapped over the K NPCs inside each (already-vmapped) world.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.agents.autopilot import local_planner_act
from gail_carla_tpu.agents.controllers import make_autopilot
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.dynamics import (
    VehicleParams, VehicleState, step_vehicle,
)
from gail_carla_tpu.sim.state import TrafficState, make_empty_traffic
from gail_carla_tpu.sim.transforms import cast_angle, vec_global_to_ref

NPC_PARAMS = VehicleParams()  # same vehicle class as the ego

# Sidewalk band centre, metres beyond the lane half-width (CARLA pavements
# are ~2 m wide; the navmesh keeps walkers near their middle).
SIDEWALK_OFFSET = 1.2
# Mean seconds between road crossings per walker (CARLA's
# set_pedestrians_cross_factor default keeps crossings rare).
CROSS_EVERY_S = 40.0


def reset_traffic(
    scene: StaticScene, cfg: EnvConfig, rng, ego_xy, route_id=None
) -> TrafficState:
    """Spawn K vehicles on random patrol points >= 10 m from the ego
    (zombie_vehicle_handler.py:30-40) and W walkers at random spawn
    points with random goals and speeds.

    The last ``cfg.n_scenario_actors`` vehicle slots are the task's
    scripted scenario actors (scenario_actor_handler.py:15-37): they spawn
    at the start of their route-specific polyline (scene.sa_patrol keyed by
    the ego's route) at their task-defined target speed; routes with fewer
    actors park the spare slots far away."""
    K, W = cfg.n_npc_vehicles, cfg.n_npc_walkers
    A = cfg.n_scenario_actors
    t = make_empty_traffic(K + A, W)
    if K + A == 0 and W == 0:
        return t
    k_p, k_h, k_s, k_wx, k_wg, k_ws = jax.random.split(rng, 6)

    if A > 0:
        if route_id is None:
            route_id = jnp.zeros((), jnp.int32)
        width = scene.sa_patrol.shape[1]
        j = jnp.arange(A)
        row = jnp.where(
            j < width,
            scene.sa_patrol[route_id, jnp.minimum(j, width - 1)],
            -1,
        )
        active = row >= 0
        row_safe = jnp.maximum(row, 0)
        sa_xy = jnp.where(
            active[:, None],
            scene.patrol_xy[row_safe, 0],
            1.0e6 + 10.0 * j.astype(jnp.float32)[:, None],
        )
        sa_yaw = jnp.where(active, scene.patrol_yaw[row_safe, 0], 0.0)
        sa_speed = jnp.where(
            active,
            scene.sa_speed[route_id, jnp.minimum(j, width - 1)],
            0.0,
        )
        t = t.replace(
            veh=jax.tree.map(
                lambda full, sa: full.at[K:].set(sa),
                t.veh,
                VehicleState(xy=sa_xy, yaw=sa_yaw,
                             speed=jnp.zeros((A,))),
            ),
            veh_patrol=t.veh_patrol.at[K:].set(row_safe.astype(jnp.int32)),
            veh_target_speed=t.veh_target_speed.at[K:].set(sa_speed),
        )

    if K > 0:
        P = scene.patrol_xy.shape[0]
        # 4 candidate (patrol, head) pairs per NPC; take the first >= 10 m
        # from the ego and >= 8 m from previously placed candidates' slots.
        C = 4
        pat = jax.random.randint(k_p, (K, C), 0, P)
        frac = jax.random.uniform(k_h, (K, C))

        def cand_pos(p, f):
            n = scene.patrol_n[p]
            h = (f * (n.astype(jnp.float32) - 80.0)).astype(jnp.int32)
            h = jnp.clip(h, 0, n - 2)
            return h, jax.lax.dynamic_slice(
                scene.patrol_xy, (p, h, 0), (1, 1, 2)
            )[0, 0]

        heads, pos = jax.vmap(jax.vmap(cand_pos))(pat, frac)   # (K,C,..)
        dist_ego = jnp.linalg.norm(pos - ego_xy[None, None, :], axis=-1)
        ok = dist_ego >= 10.0
        pick = jnp.argmax(
            ok.astype(jnp.float32)
            + jax.random.uniform(k_s, (K, C)) * 0.1, axis=1
        )
        sel = lambda a: jnp.take_along_axis(  # noqa: E731
            a, pick[:, None] if a.ndim == 2 else pick[:, None, None], axis=1
        ).squeeze(1)
        patrol = sel(pat)
        head = sel(heads)
        xy = sel(pos)

        def pyaw(p, h):
            return jax.lax.dynamic_slice(scene.patrol_yaw, (p, h), (1, 1))[
                0, 0
            ]

        yaw = jax.vmap(pyaw)(patrol, head)
        t = t.replace(
            veh=jax.tree.map(
                lambda full, nv: full.at[:K].set(nv),
                t.veh,
                VehicleState(xy=xy, yaw=yaw, speed=jnp.zeros((K,))),
            ),
            veh_patrol=t.veh_patrol.at[:K].set(patrol.astype(jnp.int32)),
            veh_head=t.veh_head.at[:K].set(head.astype(jnp.int32)),
            veh_target_speed=t.veh_target_speed.at[:K].set(
                jax.random.uniform(k_s, (K,), minval=4.5, maxval=6.5)
            ),
        )

    if W > 0:
        wxy, wn, on_sidewalk = _walker_arrays(scene)
        P = wxy.shape[0]
        pat = jax.random.randint(k_wx, (W,), 0, P)
        frac = jax.random.uniform(k_wg, (W,))

        def start(p, f):
            n = wn[p]
            h = jnp.clip(
                (f * (n.astype(jnp.float32) - 2.0)).astype(jnp.int32),
                0, n - 2,
            )
            win = jax.lax.dynamic_slice(wxy, (p, h, 0), (1, 2, 2))[0]
            return h, win[0], win[1]

        head, c0, c1 = jax.vmap(start)(pat, frac)
        seg = c1 - c0
        tang = seg / (jnp.linalg.norm(seg, axis=-1, keepdims=True) + 1e-6)
        normal = jnp.stack([-tang[:, 1], tang[:, 0]], axis=-1)
        k_side, k_speed = jax.random.split(k_ws)
        if on_sidewalk:
            # real pavement centrelines: walk them at offset 0
            off = jnp.zeros((W,))
        else:
            # right-hand traffic (town.py:12): the kerbside pavement is to
            # the RIGHT (+normal) of the lane direction; the opposite
            # pavement sits past the oncoming lane
            near = scene.half_lane + SIDEWALK_OFFSET
            far = -(3.0 * scene.half_lane + SIDEWALK_OFFSET)
            off = jnp.where(
                jax.random.uniform(k_side, (W,)) < 0.5, near, far
            )
        t = t.replace(
            walker_xy=c0 + off[:, None] * normal,
            walker_yaw=jnp.arctan2(tang[:, 1], tang[:, 0]),
            walker_patrol=pat.astype(jnp.int32),
            walker_head=head.astype(jnp.int32),
            walker_off=off,
            walker_off_t=off,
            walker_speed=jax.random.uniform(
                k_speed, (W,), minval=1.0, maxval=2.0
            ),
        )
    return t


def _walker_arrays(scene: StaticScene):
    """(polyline_xy, polyline_n, on_sidewalk): real sidewalk centrelines
    when the scene has them (H5-imported towns), else the vehicle patrol
    polylines (procedural towns use lateral pavement bands)."""
    if scene.walk_xy is not None:
        return scene.walk_xy, scene.walk_n, True
    return scene.patrol_xy, scene.patrol_n, False


def _advance_patrol(scene, patrol, head, xy, window: int = 6):
    """Same forward-walk as the ego route cursor (task_vehicle.py:103-128)
    over the patrol arrays."""
    win = jax.lax.dynamic_slice(
        scene.patrol_xy, (patrol, head, 0), (1, window + 1, 2)
    )[0]
    p0, p1 = win[:-1], win[1:]
    dot = jnp.sum((p1 - p0) * (xy[None, :] - p0), axis=-1)
    offs = jnp.arange(window)
    n = scene.patrol_n[patrol]
    valid = (head + offs) < (n - 1)
    adv = jnp.max(jnp.where((dot > 0) & valid, offs + 1, 0))
    return jnp.minimum(head + adv, n - 1)


def step_traffic(
    scene: StaticScene,
    cfg: EnvConfig,
    traffic: TrafficState,
    ego: VehicleState,
    sim_time,
    rng,
) -> TrafficState:
    """One tick for all NPCs in one world. The last
    ``cfg.n_scenario_actors`` vehicle slots are scripted scenario actors:
    they ignore lead/red-light braking (the reference's scenario agents
    drive blind — constant_speed_agent.py:5-29, basic_agent.py:32 disables
    hazard checks) and stop at the end of their route instead of
    teleporting back."""
    K = traffic.veh_patrol.shape[0]
    W = traffic.walker_xy.shape[0]
    if K == 0 and W == 0:
        return traffic
    out = traffic
    n_sa = cfg.n_scenario_actors
    is_scenario = jnp.arange(K) >= (K - n_sa)

    if K > 0:
        tl_states = signals.light_states(scene, sim_time)
        # --- lead-vehicle braking: candidates are the ego + all NPCs ---
        all_xy = jnp.concatenate(
            [traffic.veh.xy, ego.xy[None, :]], axis=0
        )                                              # (K+1, 2)
        all_yaw = jnp.concatenate(
            [traffic.veh.yaw, ego.yaw[None]], axis=0
        )

        def npc_desired(i, veh_i):
            rel = all_xy - veh_i.xy[None, :]
            local = jax.vmap(vec_global_to_ref, in_axes=(0, None))(
                rel, veh_i.yaw
            )
            dist = jnp.linalg.norm(local, axis=-1)
            angle = jnp.abs(jnp.arctan2(local[:, 1], local[:, 0]))
            same = jnp.abs(cast_angle(all_yaw - veh_i.yaw)) <= jnp.deg2rad(
                150.0
            )
            notme = jnp.arange(K + 1) != i
            hazard = (
                notme & same & (angle < jnp.deg2rad(45.0)) & (dist < 12.0)
            )
            d_lead = jnp.min(jnp.where(hazard, dist, 1e9))
            spd_lead = jnp.where(
                d_lead < 1e9,
                6.0 * jnp.clip(jnp.maximum(d_lead - 8.0, 0.0), 0, 5) / 5.0,
                1e9,
            )
            state, loc, idx = signals.affecting_light(
                scene, veh_i.xy, veh_i.yaw, tl_states,
                offset=-0.8 * NPC_PARAMS.half_length, dist_threshold=18.0,
            )
            red = (state == signals.RED) | (state == signals.YELLOW)
            d_rl = jnp.linalg.norm(loc)
            spd_rl = jnp.where(
                red,
                6.0 * jnp.clip(jnp.maximum(d_rl - 5.0, 0.0), 0, 5) / 5.0,
                1e9,
            )
            return jnp.minimum(spd_lead, spd_rl)

        desired_cap = jax.vmap(npc_desired)(
            jnp.arange(K), traffic.veh
        )
        target = jnp.where(
            is_scenario,
            traffic.veh_target_speed,
            jnp.minimum(traffic.veh_target_speed, desired_cap),
        )

        ap, actions = jax.vmap(
            lambda a, v, p, h, ts: local_planner_act(
                scene.patrol_xy, scene.patrol_cmd, a, v, p, h, ts
            )
        )(
            traffic.veh_ap, traffic.veh, traffic.veh_patrol,
            traffic.veh_head, target,
        )
        veh = jax.vmap(
            lambda v, a: step_vehicle(
                v, a[0], a[1], 0.0, cfg.dt, NPC_PARAMS
            )
        )(traffic.veh, actions)
        head = jax.vmap(
            lambda p, h, xy: _advance_patrol(scene, p, h, xy)
        )(traffic.veh_patrol, traffic.veh_head, veh.xy)

        # patrol exhausted -> zombies teleport back to the start
        # (zombie_vehicle.py); scenario actors stop at their route end
        n = scene.patrol_n[traffic.veh_patrol]
        at_end = head >= jnp.where(is_scenario, n - 2, n - 8)
        teleport = at_end & (~is_scenario)
        start_xy = jax.vmap(
            lambda p: jax.lax.dynamic_slice(
                scene.patrol_xy, (p, 0, 0), (1, 1, 2)
            )[0, 0]
        )(traffic.veh_patrol)
        start_yaw = jax.vmap(
            lambda p: jax.lax.dynamic_slice(
                scene.patrol_yaw, (p, 0), (1, 1)
            )[0, 0]
        )(traffic.veh_patrol)
        veh = VehicleState(
            xy=jnp.where(teleport[:, None], start_xy, veh.xy),
            yaw=jnp.where(teleport, start_yaw, veh.yaw),
            speed=jnp.where(at_end, 0.0, veh.speed),
        )
        head = jnp.where(teleport, 0, head)
        ap0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (K,) + a.shape), make_autopilot()
        )
        ap = jax.tree.map(
            lambda a, b: jnp.where(
                teleport.reshape((K,) + (1,) * (a.ndim - 1)), b, a
            ),
            ap, ap0,
        )
        out = out.replace(
            veh=veh, veh_head=head.astype(jnp.int32), veh_ap=ap,
            # ended scenario actors park for the rest of the episode
            veh_target_speed=jnp.where(
                at_end & is_scenario, 0.0, traffic.veh_target_speed
            ),
        )

    if W > 0:
        # sidewalk following: chase the next polyline point displaced by the
        # current lateral offset; a crossing retargets the offset across the
        # road (the offset lerps over at walking speed).
        wxy, wn, on_sidewalk = _walker_arrays(scene)

        def wp_rows(p, h):
            win = jax.lax.dynamic_slice(wxy, (p, h, 0), (1, 2, 2))[0]
            return win[0], win[1]

        c0, c1 = jax.vmap(wp_rows)(
            traffic.walker_patrol, traffic.walker_head
        )
        seg = c1 - c0
        tang = seg / (jnp.linalg.norm(seg, axis=-1, keepdims=True) + 1e-6)
        normal = jnp.stack([-tang[:, 1], tang[:, 0]], axis=-1)

        # a crossing toggles the target between the kerbside pavement and
        # the one across the road (both off-road bands; the walker is ON
        # the road only while traversing)
        flip = jax.random.uniform(rng, (W,)) < cfg.dt / CROSS_EVERY_S
        if on_sidewalk:
            other = scene.walk_cross[traffic.walker_patrol]
            flip_target = jnp.where(
                jnp.abs(traffic.walker_off_t) < 0.5 * jnp.abs(other),
                other, 0.0,
            )
        else:
            near = scene.half_lane + SIDEWALK_OFFSET
            far = -(3.0 * scene.half_lane + SIDEWALK_OFFSET)
            flip_target = near + far - traffic.walker_off_t
        off_t = jnp.where(flip, flip_target, traffic.walker_off_t)
        step_len = traffic.walker_speed * cfg.dt
        off = traffic.walker_off + jnp.clip(
            off_t - traffic.walker_off, -step_len, step_len
        )

        target = c1 + off[:, None] * normal
        d = target - traffic.walker_xy
        dist = jnp.linalg.norm(d, axis=-1)
        step = d / (dist[:, None] + 1e-6) * step_len[:, None]
        new_xy = traffic.walker_xy + step
        yaw = jnp.arctan2(d[:, 1], d[:, 0])

        n = wn[traffic.walker_patrol]
        head = jnp.where(
            dist < 1.0,
            traffic.walker_head + 1,
            traffic.walker_head,
        )
        # polyline exhausted -> loop back to its start (the reference's
        # walkers respawn on navmesh death, zombie_walker_handler.py:60-75)
        at_end = head >= n - 1
        head = jnp.where(at_end, 0, head)
        s0, s1 = jax.vmap(wp_rows)(
            traffic.walker_patrol, jnp.zeros((W,), jnp.int32)
        )
        sseg = s1 - s0
        stang = sseg / (
            jnp.linalg.norm(sseg, axis=-1, keepdims=True) + 1e-6
        )
        snormal = jnp.stack([-stang[:, 1], stang[:, 0]], axis=-1)
        new_xy = jnp.where(
            at_end[:, None], s0 + off[:, None] * snormal, new_xy
        )
        out = out.replace(
            walker_xy=new_xy, walker_yaw=yaw,
            walker_head=head.astype(jnp.int32),
            walker_off=off, walker_off_t=off_t,
        )
    return out
