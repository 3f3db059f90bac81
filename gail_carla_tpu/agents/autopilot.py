"""Scripted expert: the reference's BasicAgent/LocalPlanner/PID stack as
pure jittable functions.

Traces:
- PID with a 30-sample error window:   .../agents/utils/controller.py:4-29
- target-waypoint selection + 2 PIDs:  .../agents/utils/local_planner.py:22-78
- expert wiring (target speed 6 m/s):  carla_exp.py:49-53, basic_agent.py:18-46
  (BasicAgent's hazard checks are disabled in the reference,
  basic_agent.py:32 — so the expert is exactly the LocalPlanner)

The expert runs vmapped over thousands of worlds to generate demonstrations
on device, replacing the PNG + episode.json pipeline for training (a
file-compatible exporter lives in tools/gen_trajectories.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.agents.controllers import (  # noqa: F401 (re-exports)
    PID_WINDOW, AutopilotState, PIDState, make_autopilot, make_pid,
    pid_step,
)
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.state import WorldState
from gail_carla_tpu.sim.transforms import loc_global_to_ref

# local_planner.py defaults

LON_PID = (0.5, 0.025, 0.1)
LAT_PID = (0.75, 0.05, 0.0)
THRESHOLD_BEFORE = 7.5
THRESHOLD_AFTER = 5.0
MAX_SKIP = 20
TARGET_SPEED = 6.0  # m/s, carla_exp.py:49


def local_planner_act(
    route_xy,
    route_cmd,
    ap: AutopilotState,
    ego,
    rid,
    head,
    target_speed=TARGET_SPEED,
):
    """One LocalPlanner decision over any padded route family (ego routes or
    NPC patrols): scan the next 20 route points; each point within threshold
    becomes the new target and updates last_command *sequentially* (the
    threshold for later points depends on earlier updates, so this is a
    lax.scan, not a reduction)."""
    offs = jnp.arange(MAX_SKIP)
    # contiguous windows (route rows pad with the final point past n-1)
    pts = jax.lax.dynamic_slice(
        route_xy, (rid, head, 0), (1, MAX_SKIP, 2)
    )[0]                                          # (20, 2)
    opts = jax.lax.dynamic_slice(
        route_cmd, (rid, head), (1, MAX_SKIP)
    )[0]                                          # (20,)
    dists = jnp.linalg.norm(pts - ego.xy[None, :], axis=-1)

    def scan_body(carry, inp):
        last_cmd, target_i = carry
        i, dist, opt = inp
        thresh = jnp.where(
            (last_cmd == 4) & (opt != 4), THRESHOLD_BEFORE, THRESHOLD_AFTER
        )
        hit = dist < thresh
        last_cmd = jnp.where(hit, opt, last_cmd)
        target_i = jnp.where(hit, i, target_i)
        return (last_cmd, target_i), None

    (last_cmd, target_i), _ = jax.lax.scan(
        scan_body,
        (ap.last_command, jnp.full((), -1, jnp.int32)),
        (offs.astype(jnp.int32), dists, opts),
    )
    # local_planner.py:52-53: step one past the last point within threshold
    target_i = jnp.minimum(target_i + 1, MAX_SKIP - 1)
    target_cmd = opts[target_i]
    target_xy = pts[target_i]

    local = loc_global_to_ref(target_xy, ego.xy, ego.yaw)
    theta = jnp.arctan2(local[1], local[0])
    turn_pid, steer = pid_step(ap.turn_pid, theta, *LAT_PID)

    # slow down off lane-follow/straight (local_planner.py:66-67)
    tspeed = jnp.where(
        (target_cmd == 3) | (target_cmd == 4), target_speed,
        target_speed * 0.75,
    )
    delta = tspeed - ego.speed
    speed_pid, throttle = pid_step(ap.speed_pid, delta, *LON_PID)

    steer = jnp.clip(steer, -1.0, 1.0)
    throttle = jnp.clip(throttle, 0.0, 1.0)
    action = jnp.stack([steer, throttle])
    return (
        AutopilotState(
            turn_pid=turn_pid, speed_pid=speed_pid, last_command=last_cmd
        ),
        action,
    )


def autopilot_act(
    scene: StaticScene,
    ap: AutopilotState,
    world: WorldState,
    target_speed: float = TARGET_SPEED,
    obey_signals: bool = False,
):
    """The expert (BasicAgent, carla_exp.py:49): LocalPlanner over the ego's
    truncated dense route.

    ``obey_signals=False`` matches the reference exactly — BasicAgent's
    red-light/hazard checks are disabled (basic_agent.py:32), so its demos
    run signals and so do policies trained on them. ``obey_signals=True``
    additionally caps the target speed with the ValeoAction-style ramps for
    red/yellow lights, un-completed stop signs and lead hazards — a
    leaderboard-clean expert the reference never had."""
    tspeed = jnp.asarray(target_speed)
    if obey_signals:
        from gail_carla_tpu.sim import signals
        from gail_carla_tpu.sim.rewards import hazard_vehicle, hazard_walker

        ego = world.ego
        t_now = world.step.astype(jnp.float32) * 0.1
        tl_states = signals.light_states(scene, t_now)
        state_f, loc_f, idx_f = signals.affecting_light(
            scene, ego.xy, ego.yaw, tl_states, dist_threshold=50.0,
            lateral_slack=0.6,
        )
        # Route-scan detection: the pose-based affecting_light query only
        # sees a light once the ego projects onto its 1.2-lane stop span,
        # which on curved approaches (Town03+) happens 8-25 m out — past
        # the brakeless point of no return. The expert KNOWS its dense
        # route, so scan the next ~64 m of it for the first stop line it
        # actually crosses (in the line's inbound direction) and measure
        # the distance ALONG the route (euclidean underestimates on
        # curves). Pose-based detection stays as the fallback.
        W = 64
        win = jax.lax.dynamic_slice(
            scene.route_xy, (world.route_id, world.head, 0), (1, W + 1, 2)
        )[0]
        wa, wb = win[:-1], win[1:]
        seglen = jnp.linalg.norm(wb - wa, axis=-1)
        cum = jnp.cumsum(seglen) - seglen
        segdir = jnp.arctan2(wb[:, 1] - wa[:, 1], wb[:, 0] - wa[:, 0])
        tl_a, tl_b = scene.tl_stop[:, 0], scene.tl_stop[:, 1]
        inter = signals.segments_intersect(
            wa[:, None, :], wb[:, None, :], tl_a[None], tl_b[None]
        )
        tl_ok = (
            (jnp.cos(scene.tl_yaw[None, :] - segdir[:, None]) > 0.5)
            & (seglen[:, None] > 1e-3)
            & (jnp.arange(tl_a.shape[0]) < scene.tl_n)[None, :]
        )
        valid_wt = inter & tl_ok
        any_w = jnp.any(valid_wt, axis=1)
        found_r = jnp.any(any_w)
        first_w = jnp.argmax(any_w)
        idx_r = jnp.argmax(valid_wt[first_w])
        d_route = (
            cum[first_w]
            + jnp.linalg.norm(win[0] - ego.xy)
            + 0.5 * seglen[first_w]
        )
        found_f = idx_f >= 0
        idx = jnp.where(found_r, idx_r, jnp.where(found_f, idx_f, -1))
        d_found = jnp.where(
            found_r, d_route, jnp.linalg.norm(loc_f)
        )
        state = jnp.where(
            found_r, tl_states[idx_r],
            jnp.where(found_f, state_f, -1),
        )

        # Coast-to-stop speed cap: the action space has no brake
        # (carla_env.py:93-94), so slowing relies on engine braking
        # (dynamics.engine_brake): v_max(d) = sqrt(2 a (d - margin)).
        def cap(dist, margin, a=0.45):
            return jnp.sqrt(
                2.0 * a * jnp.maximum(dist - margin, 0.0)
            )

        # Stop-or-commit decision. Reacting to the CURRENT colour is
        # wrong with brakeless dynamics: a yellow that catches the ego
        # 12-44 m out can neither be stopped for (coast-down from 6 m/s
        # needs ~44 m) nor cleared before red (yellow is 2 s) — the old
        # always-coast-on-yellow rule crossed on red deterministically.
        # Phases are pure functions of time (signals.light_states), so
        # predict the colour at the instant the ego's TAIL would clear
        # the stop line if it commits at target speed (+0.5 s margin so
        # a late-yellow prediction counts as red), and start coasting —
        # possibly while still green — only when that predicted colour
        # is red AND the stop is still dynamically feasible; once past
        # the point of no return, commit through instead of creeping
        # across on red.
        d_line = d_found
        found = idx >= 0
        # kinematic time-to-clear: accelerate from the current speed at
        # ~1 m/s^2 (the observed full-throttle ramp near 5 m/s), then
        # cruise — an instant-target-speed model is too optimistic when
        # the ego spawns or exits a slow turn near a light, and commits
        # to crossings it can't make
        d_tail = d_line + 6.5
        v0 = jnp.maximum(ego.speed, 0.0)
        a_acc = 1.0
        t_ramp = jnp.maximum(tspeed - v0, 0.0) / a_acc
        d_ramp = (jnp.square(tspeed) - jnp.square(v0)) / (2.0 * a_acc)
        t_clear = jnp.where(
            d_tail <= d_ramp,
            (jnp.sqrt(jnp.square(v0) + 2.0 * a_acc * d_tail) - v0) / a_acc,
            t_ramp + (d_tail - jnp.maximum(d_ramp, 0.0))
            / jnp.maximum(tspeed, 1.0),
        ) + 0.5
        state_at_clear = signals.light_states(scene, t_now + t_clear)[
            jnp.maximum(idx, 0)
        ]
        want_stop = (state == signals.RED) | (
            state_at_clear == signals.RED
        )
        can_stop = d_line > (
            jnp.square(ego.speed) / (2.0 * 0.45) + 2.5
        )
        spd_rl = jnp.where(
            found & want_stop & can_stop, cap(d_line, 4.0), tspeed
        )

        ss_active = (world.stop_target >= 0) & (~world.stop_completed)
        tgt = jnp.maximum(world.stop_target, 0)
        d_stop = jnp.linalg.norm(scene.ss_center[tgt] - ego.xy)
        spd_stop = jnp.where(ss_active, cap(d_stop, 2.0), tspeed)

        # look as far ahead as the coast-only braking distance needs
        # (v^2 / 2a + margin ≈ 48 m at 6 m/s): the reward-side detectors
        # keep the reference's 9.5 m (hazard_actor.py:16-46); the sqrt cap
        # below leaves cruise speed untouched until ~35 m
        veh_found, d_veh = hazard_vehicle(
            world.traffic, ego.xy, ego.yaw,
            proximity_threshold=48.0, distance_threshold=48.0,
        )
        ped_found, d_ped = hazard_walker(
            world.traffic, ego.xy, ego.yaw, proximity_threshold=30.0,
        )
        spd_veh = jnp.where(veh_found, cap(d_veh, 8.0), tspeed)
        spd_ped = jnp.where(ped_found, cap(d_ped, 6.0), tspeed)

        tspeed = jnp.minimum(
            tspeed,
            jnp.minimum(
                jnp.minimum(spd_rl, spd_stop), jnp.minimum(spd_veh, spd_ped)
            ),
        )

    return local_planner_act(
        scene.route_xy, scene.route_cmd, ap, world.ego,
        world.route_id, world.head, tspeed,
    )


def reset_autopilot_where(done, ap: AutopilotState) -> AutopilotState:
    """Clear controller state at episode boundaries (a fresh BasicAgent is
    constructed per episode in carla_exp.py:49)."""
    fresh = make_autopilot()
    return jax.tree.map(lambda a, b: jnp.where(done, b, a), ap, fresh)
