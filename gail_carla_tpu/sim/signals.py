"""Traffic-light phases and signal queries.

The reference's lights are stateful actors inside the CARLA server, indexed
by a static registry (``carla_gym/utils/traffic_light.py:79-199``). Here
phase is a pure function of sim time — per junction, the two approach groups
alternate green/yellow/red on a fixed cycle with a per-junction offset, so
no signal state lives in WorldState at all.
"""
from __future__ import annotations

import jax.numpy as jnp

from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.transforms import vec_global_to_ref

GREEN, YELLOW, RED = 0, 1, 2

GREEN_S = 10.0
YELLOW_S = 2.0
CYCLE_S = 2.0 * (GREEN_S + YELLOW_S)


def light_states(scene: StaticScene, sim_time) -> jnp.ndarray:
    """(T,) int32 state of every light at sim_time."""
    offset = (scene.tl_junction.astype(jnp.float32) * 7.0) % CYCLE_S
    phase = (sim_time + offset) % CYCLE_S
    # group 0: green [0, 10), yellow [10, 12), red [12, 24)
    s0 = jnp.where(
        phase < GREEN_S, GREEN, jnp.where(phase < GREEN_S + YELLOW_S,
                                          YELLOW, RED)
    )
    # group 1: red while group 0 runs, then green/yellow
    s1 = jnp.where(
        phase < GREEN_S + YELLOW_S, RED,
        jnp.where(phase < 2 * GREEN_S + YELLOW_S, GREEN, YELLOW),
    )
    return jnp.where(scene.tl_group == 0, s0, s1).astype(jnp.int32)


def stopline_center(scene: StaticScene):
    return 0.5 * (scene.tl_stop[:, 0] + scene.tl_stop[:, 1])


def affecting_light(scene: StaticScene, ego_xy, ego_yaw, states,
                    offset: float = 0.0, dist_threshold: float = 18.0,
                    lateral_slack: float = 0.1):
    """Port of TrafficLightHandler.get_light_state (traffic_light.py:113-156):
    the nearest light whose stop line lies ahead of (ego + offset*fwd),
    heading-aligned and laterally within the line span.

    Returns (state, loc_in_ev (2,), idx) with state == -1 / idx == -1 when
    no light affects the vehicle."""
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    base = ego_xy + offset * fwd
    center = stopline_center(scene)
    rel = center - base[None, :]
    local = vec_global_to_ref(rel, ego_yaw)          # (T, 2)
    dist = jnp.linalg.norm(rel, axis=-1)

    aligned = (
        jnp.cos(scene.tl_yaw - ego_yaw) > 0.0
    )
    ahead = local[:, 0] > 0.0
    # lateral containment: projection of base onto the stop segment in [0,1]
    a = scene.tl_stop[:, 0]
    b = scene.tl_stop[:, 1]
    ab = b - a
    t = jnp.sum((base[None, :] - a) * ab, -1) / (
        jnp.sum(ab * ab, -1) + 1e-9
    )
    # lateral_slack > 0.1 widens the containment band (in lane-span
    # units): on curved approaches (Town03+) the ego projects outside its
    # stop line's 1.2-lane span until close, so a compliant agent that
    # needs early warning to coast down queries with extra slack
    in_lane = (t > -lateral_slack) & (t < 1.0 + lateral_slack)

    valid = aligned & ahead & in_lane & (dist < dist_threshold)
    valid = valid & (jnp.arange(dist.shape[0]) < scene.tl_n)
    big = 1e9
    masked = jnp.where(valid, dist, big)
    idx = jnp.argmin(masked)
    found = masked[idx] < big
    state = jnp.where(found, states[idx], -1)
    loc = jnp.where(found, local[idx], jnp.zeros(2))
    return state, loc, jnp.where(found, idx, -1)


def segments_intersect(p1, p2, q1, q2):
    """2D segment intersection via orientation tests (replaces shapely in
    run_red_light.py:56-64)."""

    def orient(a, b, c):
        return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
            b[..., 1] - a[..., 1]
        ) * (c[..., 0] - a[..., 0])

    d1 = orient(q1, q2, p1)
    d2 = orient(q1, q2, p2)
    d3 = orient(p1, p2, q1)
    d4 = orient(p1, p2, q2)
    return ((d1 * d2) < 0) & ((d3 * d4) < 0)


def point_in_stop_box(point, center, yaw, extent):
    """Stop-sign trigger test. The reference inflates the box to a square of
    the max extent and tests it axis-aligned (run_stop_sign.py:130-157); we
    keep the square inflation but test in the sign's frame."""
    del yaw  # reference uses an axis-aligned test; keep its behaviour
    m = jnp.maximum(extent[..., 0], extent[..., 1])
    d = jnp.abs(point - center)
    return (d[..., 0] < m) & (d[..., 1] < m)
