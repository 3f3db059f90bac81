"""Stateful infraction criteria as branchless masked updates.

Ports of the reference's seven criteria classes (``carla_gym/core/task_actor/
common/criteria/``). Blocked, route-deviation and route-completion live
inline in sim/env.py; this module holds the signal-dependent ones:

- RunRedLight   (run_red_light.py):   tail segment crosses a red stop line
- RunStopSign   (run_stop_sign.py):   encounter/stop/run state machine
- EncounterLight (encounter_light.py): new light within 7.5 m
- OutsideRouteLane (outside_route_lane.py): off driving lanes / wrong lane

Each function takes the relevant WorldState slices and returns (new state
fields, event flags) — the caller (step_env) threads them through the
episode counters used for the leaderboard score (ego_vehicle_handler.py:
9-13, 208-248).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.dynamics import VehicleParams, VehicleState
from gail_carla_tpu.sim.transforms import cast_angle


def run_red_light(
    scene: StaticScene,
    params: VehicleParams,
    ego: VehicleState,
    states,               # (T,) light states this tick
    last_red_light,       # () i32
    last_cross_light=None,  # () i32 last stop line crossed at ANY colour
    distance_light: float = 30.0,
):
    """Returns (last_red_light', last_cross_light', ran_now (bool))."""
    fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])
    tail_close = ego.xy - 0.8 * params.half_length * fwd
    tail_far = ego.xy - (params.half_length + 1.0) * fwd

    center = signals.stopline_center(scene)
    near = jnp.linalg.norm(center - ego.xy[None, :], axis=-1) < distance_light
    red = states == signals.RED
    not_last = jnp.arange(states.shape[0]) != last_red_light
    # within 60 deg of the light's inbound direction: a turning route
    # sweeping through a large skewed junction (Town03+) momentarily
    # aligns with OTHER approaches' stop lines; CARLA scores only the
    # light governing the ego's own lane (traffic_light.py:113-156)
    aligned = jnp.cos(scene.tl_yaw - ego.yaw) > 0.5
    # one red per junction traversal: after scoring a light, its
    # junction's remaining stop lines stay unscoreable until the ego has
    # left the junction area (a single crossing of a big junction
    # geometrically intersects several foreign entry lines)
    safe_last = jnp.maximum(last_red_light, 0)
    last_ju = jnp.where(
        last_red_light >= 0, scene.tl_junction[safe_last], -2
    )
    d_last = jnp.linalg.norm(center[safe_last] - ego.xy)
    same_junc_near = (
        (scene.tl_junction == last_ju)
        & (d_last < 40.0)
        & (last_red_light >= 0)
    )
    # lane containment of the tail (replaces the road/lane id equality test)
    a = scene.tl_stop[:, 0]
    b = scene.tl_stop[:, 1]
    ab = b - a
    t = jnp.sum((tail_far[None, :] - a) * ab, -1) / (
        jnp.sum(ab * ab, -1) + 1e-9
    )
    in_lane = (t > 0.0) & (t < 1.0)

    crossing = signals.segments_intersect(
        tail_close[None, :], tail_far[None, :], a, b
    )
    live = jnp.arange(states.shape[0]) < scene.tl_n
    # entering-the-junction gate: once the ego has crossed ANY stop line
    # of junction J (green entry included), J's remaining interior lines
    # are not scoreable until the ego has left J — a route through a big
    # junction geometrically crosses the other approaches' lines, which
    # in CARLA carry no trigger volume over the interior
    if last_cross_light is None:
        last_cross_light = jnp.full((), -1, jnp.int32)
    safe_cross = jnp.maximum(last_cross_light, 0)
    cross_ju = jnp.where(
        last_cross_light >= 0, scene.tl_junction[safe_cross], -2
    )
    d_cross = jnp.linalg.norm(center[safe_cross] - ego.xy)
    inside_junc = (
        (scene.tl_junction == cross_ju)
        & (d_cross < 40.0)
        & (last_cross_light >= 0)
    )
    crossed_any = near & aligned & in_lane & crossing & live
    hit = (crossed_any & red & not_last & ~same_junc_near & ~inside_junc)
    any_hit = jnp.any(hit)
    idx = jnp.argmax(hit)
    last = jnp.where(any_hit, idx, last_red_light).astype(jnp.int32)
    any_cross = jnp.any(crossed_any)
    last_cross = jnp.where(
        any_cross, jnp.argmax(crossed_any), last_cross_light
    ).astype(jnp.int32)
    return last, last_cross, any_hit


class StopSignState(NamedTuple):
    target: jnp.ndarray        # () i32, -1 = none
    completed: jnp.ndarray     # () bool
    affected: jnp.ndarray      # () bool


def _affected_by_stop(scene: StaticScene, route_pts, ego_xy, sign_idx=None):
    """(S,) which stop signs cover the ego or its next ~20 route metres
    (run_stop_sign.is_affected_by_stop, with the lane-forward walk replaced
    by the dense-route window — same 1 m x 20 horizon)."""
    pts = jnp.concatenate([ego_xy[None, :], route_pts], axis=0)  # (21, 2)
    inside = signals.point_in_stop_box(
        pts[:, None, :], scene.ss_center[None, :, :], scene.ss_yaw[None, :],
        scene.ss_extent[None, :, :],
    )                                                            # (21, S)
    near = (
        jnp.linalg.norm(scene.ss_center - ego_xy[None, :], axis=-1) < 50.0
    )
    valid = jnp.arange(scene.ss_center.shape[0]) < scene.ss_n
    return jnp.any(inside, axis=0) & near & valid


def run_stop_sign(
    scene: StaticScene,
    ego: VehicleState,
    route_pts,            # (20, 2) dense route ahead (1 m spacing)
    route_yaw0,           # () lane direction at the ego
    st: StopSignState,
    speed_threshold: float = 0.1,
):
    """Returns (st', encountered_now, ran_now)."""
    affected_mask = _affected_by_stop(scene, route_pts, ego.xy)

    # --- no target: scan (only when heading along the lane) ---
    right_way = jnp.cos(route_yaw0 - ego.yaw) > 0.0
    any_affecting = jnp.any(affected_mask) & right_way
    first = jnp.argmax(affected_mask)
    no_target = st.target < 0
    encountered = no_target & any_affecting
    target_new = jnp.where(encountered, first, st.target).astype(jnp.int32)

    # --- with target: track stop / containment / leave ---
    has_target = ~no_target
    speed = jnp.abs(ego.speed)
    completed = st.completed | (has_target & (speed < speed_threshold))
    tgt = jnp.maximum(st.target, 0)
    inside_now = signals.point_in_stop_box(
        ego.xy, scene.ss_center[tgt], scene.ss_yaw[tgt], scene.ss_extent[tgt]
    )
    affected = st.affected | (has_target & inside_now)
    still_affecting = affected_mask[tgt]
    left = has_target & (~still_affecting)
    ran = left & affected & (~completed)

    new = StopSignState(
        target=jnp.where(left, -1, target_new).astype(jnp.int32),
        completed=jnp.where(left, False, completed),
        affected=jnp.where(left, False, affected),
    )
    return new, encountered, ran


def encounter_light(
    scene: StaticScene,
    ego: VehicleState,
    states,
    encountered_id,       # () i32 last encountered light
    dist_threshold: float = 7.5,
):
    """criteria/encounter_light.py: a (new) non-green light whose stop line
    is within 7.5 m ahead. Returns (encountered_id', encountered_now)."""
    state, _, idx = signals.affecting_light(
        scene, ego.xy, ego.yaw, states, dist_threshold=dist_threshold
    )
    hit = (idx >= 0) & (idx != encountered_id)
    new_id = jnp.where(hit, idx, encountered_id).astype(jnp.int32)
    return new_id, hit


def outside_route_lane(
    scene: StaticScene,
    ego: VehicleState,
    road_segs,            # (Mr, 4) ego cell road capsules
    road_is_junction,     # (Mr,) f32 1.0 = junction connector
    allowed_out: float = 1.3,
    max_vehicle_angle_deg: float = 120.0,
):
    """outside_route_lane.py, adapted: the nearest road capsule plays the
    role of map.get_waypoint. Lanes are directional capsules here, so
    "wrong lane" falls out naturally as driving >120° against the nearest
    lane's direction (the reference needs road/lane-id latching because its
    waypoint projection is direction-blind). Returns (outside, wrong)."""
    a = road_segs[:, :2]
    b = road_segs[:, 2:]
    ab = b - a
    t = jnp.clip(
        jnp.sum((ego.xy[None, :] - a) * ab, -1)
        / (jnp.sum(ab * ab, -1) + 1e-9),
        0.0, 1.0,
    )
    d = jnp.linalg.norm(ego.xy[None, :] - (a + t[:, None] * ab), axis=-1)
    nearest = jnp.argmin(d)
    outside = d[nearest] > (scene.half_lane + allowed_out)

    seg_dir = ab[nearest]
    seg_yaw = jnp.arctan2(seg_dir[1], seg_dir[0])
    angle = jnp.abs(cast_angle(seg_yaw - ego.yaw))
    in_junction = road_is_junction[nearest] > 0.5
    wrong = (~in_junction) & (
        angle > jnp.deg2rad(max_vehicle_angle_deg)
    ) & (~outside)
    return outside, wrong
