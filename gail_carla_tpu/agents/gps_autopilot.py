"""GPS-space expert — port of the reference's alternate autopilot
(``auto_pilot/auto_pilot.py:11-71`` + ``auto_pilot/planner.py:40-100``).

Differences from the LocalPlanner expert (agents/autopilot.py): it navigates
purely in GPS coordinates with two pop-window route followers (near:
min/max 4e-5/50e-5 deg; far: 7.5e-5/25e-5 — far kept for API parity, the
control law only uses the near node and a fixed 4 m/s target), a window-40
steering PID (1.25/0.75/0.3) on heading-angle/90, a speed PID (5/0.5/1)
with throttle clipped to 0.75, and Gaussian steer noise 1e-2.

The GPS route here is the leaderboard plan (scene.plan_gps); the window
cursor replaces the reference's deque popping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.state import WorldState
from gail_carla_tpu.sim.transforms import location_to_gps

GPS_PID_WINDOW = 40  # pid_controller.py n=40


@struct.dataclass
class GpsPIDState:
    buf: jnp.ndarray    # (GPS_PID_WINDOW,)
    idx: jnp.ndarray
    count: jnp.ndarray
    prev: jnp.ndarray


def _make_gps_pid() -> GpsPIDState:
    return GpsPIDState(
        buf=jnp.zeros((GPS_PID_WINDOW,)),
        idx=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        prev=jnp.zeros(()),
    )


def _gps_pid_step(st: GpsPIDState, error, kp, ki, kd):
    """auto_pilot/pid_controller.py: integral = window MEAN (not sum*dt),
    derivative = last difference."""
    buf = st.buf.at[st.idx].set(error)
    count = jnp.minimum(st.count + 1, GPS_PID_WINDOW)
    have2 = count >= 2
    integral = jnp.where(
        have2, jnp.sum(buf) / jnp.maximum(count, 1), 0.0
    )
    deriv = jnp.where(have2, error - st.prev, 0.0)
    out = kp * error + ki * integral + kd * deriv
    return (
        GpsPIDState(buf=buf, idx=(st.idx + 1) % GPS_PID_WINDOW,
                    count=count, prev=error),
        out,
    )


@struct.dataclass
class GpsAutopilotState:
    turn_pid: GpsPIDState
    speed_pid: GpsPIDState
    near_idx: jnp.ndarray   # () i32 cursor into the plan


def make_gps_autopilot() -> GpsAutopilotState:
    return GpsAutopilotState(
        turn_pid=_make_gps_pid(),
        speed_pid=_make_gps_pid(),
        near_idx=jnp.ones((), jnp.int32),
    )


MIN_DIST_DEG = 4.0e-5    # near planner pop distance (auto_pilot.py:16)
MAX_DIST_DEG = 50.0e-5


def gps_autopilot_act(
    scene: StaticScene,
    ap: GpsAutopilotState,
    world: WorldState,
    rng,
):
    """One step: (state', action (2,)). Mirrors run_step
    (auto_pilot.py:61-71) with the plan-window cursor standing in for the
    deque pop loop."""
    ego = world.ego
    rid = world.route_id
    pn = scene.plan_n[rid]
    gps = location_to_gps(ego.xy)

    # pop-window: advance past plan points within min_distance (planner.py
    # :76-93), looking ahead while cumulative distance < max_distance
    W = 8
    offs = jnp.arange(W)
    idxs = jnp.minimum(ap.near_idx + offs, pn - 1)
    window = jax.lax.dynamic_slice(
        scene.plan_gps, (rid, ap.near_idx, 0), (1, W, 2)
    )[0]
    d = jnp.linalg.norm(window - gps[None, :], axis=-1)
    seg = jnp.linalg.norm(window[1:] - window[:-1], axis=-1)
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    valid = (cum <= MAX_DIST_DEG) & (idxs < pn - 1)
    popmask = (d <= MIN_DIST_DEG) & valid
    to_pop = jnp.max(jnp.where(popmask, offs + 1, 0))
    near_idx = jnp.minimum(ap.near_idx + to_pop, pn - 2)

    target_gps = scene.plan_gps[rid, near_idx]
    # heading angle to the target in degrees / 90 (auto_pilot.py:28-44);
    # GPS frame: lat grows "north" (-y), lon grows east (+x) -> theta from
    # compass = pi/2 - yaw; equivalently compute in world xy directly
    from gail_carla_tpu.sim.transforms import gps_to_location, vec_global_to_ref

    target_xy = gps_to_location(target_gps)
    local = vec_global_to_ref(target_xy - ego.xy, ego.yaw)
    angle = jnp.rad2deg(jnp.arctan2(local[1], local[0])) / 90.0

    turn_pid, steer = _gps_pid_step(ap.turn_pid, angle, 1.25, 0.75, 0.3)
    steer = jnp.clip(steer, -1.0, 1.0)
    steer = jnp.clip(
        steer + 1e-2 * jax.random.normal(rng), -1.0, 1.0
    )

    delta = jnp.clip(4.0 - ego.speed, 0.0, 0.25)   # auto_pilot.py:53-55
    speed_pid, throttle = _gps_pid_step(ap.speed_pid, delta, 5.0, 0.5, 1.0)
    throttle = jnp.clip(throttle, 0.0, 0.75)

    return (
        GpsAutopilotState(
            turn_pid=turn_pid, speed_pid=speed_pid, near_idx=near_idx
        ),
        jnp.stack([steer, throttle]),
    )
