"""Collision detection: the TPU-native stand-in for CARLA's
``sensor.other.collision`` (``criteria/collision.py:6-117`` classifies hits
as layout / vehicle / pedestrian; the server's physics engine detects them).

Three detectors, all pure functions of one env's state (vmapped by
``step_batch``):

- static layout: the vehicle body fully off the drivable surface
  (capsule-distance test against the step's shared road-segment fetch);
- static obstacles: ego OBB vs scene building/pole OBBs (SAT);
- dynamic: ego OBB vs zombie/scenario vehicles (SAT) and vs walkers
  (inflated containment).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gail_carla_tpu.sim.dynamics import VehicleParams, VehicleState
from gail_carla_tpu.sim.transforms import vec_global_to_ref


class DynHits(NamedTuple):
    """Per-tick dynamic-collision report, the event payload the reference's
    collision sensor carries (collision.py:88-105: other_actor id + relative
    velocities, which we reduce to a relative-speed intensity proxy)."""

    veh: jnp.ndarray       # () bool any ego-vehicle overlap
    ped: jnp.ndarray       # () bool any ego-walker overlap
    veh_id: jnp.ndarray    # () i32 first overlapping vehicle slot (0 if none)
    ped_id: jnp.ndarray    # () i32 first overlapping walker slot (0 if none)
    veh_rel_speed: jnp.ndarray  # () f32 |v_ego - v_npc| of the hit vehicle
    ped_rel_speed: jnp.ndarray  # () f32 |v_ego - v_walker| of the hit walker


def static_collision(scene, params: VehicleParams, ego: VehicleState,
                     bnd_segs, dmax=None):
    """Fires when the vehicle has fully left the HARD surface (all four
    bounding-box corners off road|shoulder|parking|sidewalk). CARLA's
    collision sensor only reports physical mesh contact
    (criteria/collision.py:49-112): mounting a curb onto the pavement is
    not a collision there (it costs OutsideRouteLane instead,
    outside_route_lane.py:5-103); past the pavement edge lie the
    buildings/fences/poles that do collide. ``bnd_segs`` comes from the
    step's single shared fetch_hard_cell (road-only fetch_bnd_cell on
    procedural towns, where the tables alias)."""
    from gail_carla_tpu.ops.bev import boundary_inside

    c, s = jnp.cos(ego.yaw), jnp.sin(ego.yaw)
    f = jnp.stack([c, s]) * params.half_length
    r = jnp.stack([-s, c]) * params.half_width
    corners = ego.xy[None, :] + jnp.stack(
        [f + r, f - r, -f + r, -f - r], axis=0
    )
    if dmax is None:
        dmax = scene.bnd_dmax
    on_road = boundary_inside(corners, bnd_segs, dmax)
    return ~jnp.any(on_road)


def obstacle_collision(scene, params: VehicleParams, ego: VehicleState):
    """Ego OBB vs static-obstacle OBBs (separating-axis test). The
    reference's collision sensor fires on any static actor
    (criteria/collision.py:49-112, layout penalty 0.65); obstacles come
    from StaticScene.ob_pose/ob_extent."""
    if scene.ob_n == 0:
        return jnp.zeros((), bool)
    he = jnp.asarray([params.half_length, params.half_width])

    def axes(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        return jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])

    O = scene.ob_pose.shape[0]
    ego_ax = axes(ego.yaw)                            # (2, 2)
    ob_ax = jax.vmap(axes)(scene.ob_pose[:, 2])       # (O, 2, 2)
    d = scene.ob_pose[:, :2] - ego.xy[None, :]        # (O, 2)
    all_ax = jnp.concatenate(
        [jnp.broadcast_to(ego_ax[None], (O, 2, 2)), ob_ax], axis=1
    )                                                 # (O, 4, 2)
    proj_d = jnp.abs(jnp.einsum("oac,oc->oa", all_ax, d))
    r_ego = jnp.abs(jnp.einsum("oac,bc->oab", all_ax, ego_ax)) @ he
    r_ob = jnp.einsum(
        "oab,ob->oa",
        jnp.abs(jnp.einsum("oac,obc->oab", all_ax, ob_ax)),
        scene.ob_extent,
    )
    separated = jnp.any(proj_d > r_ego + r_ob, axis=1)
    return jnp.any(~separated)


def dynamic_collisions(traffic, params: VehicleParams,
                       ego: VehicleState) -> DynHits:
    """Ego vs zombie vehicles (OBB-OBB separating axis) and vs walkers
    (inflated containment). Replaces the CARLA collision sensor's dynamic
    cases (criteria/collision.py:49-112 classifies by actor type) and
    reports which actor was hit plus a relative-speed intensity proxy."""
    K = traffic.veh.yaw.shape[0]
    W = traffic.walker_xy.shape[0]
    ez = jnp.zeros((), bool)
    zi = jnp.zeros((), jnp.int32)
    zf = jnp.zeros(())
    ego_vel = ego.speed * jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])

    col_veh, veh_id, veh_rel = ez, zi, zf
    if K > 0:
        he = jnp.asarray([params.half_length, params.half_width])

        def axes(yaw):
            c, s = jnp.cos(yaw), jnp.sin(yaw)
            return jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])

        ego_ax = axes(ego.yaw)                   # (2, 2)
        npc_ax = jax.vmap(axes)(traffic.veh.yaw)  # (K, 2, 2)
        d = traffic.veh.xy - ego.xy[None, :]      # (K, 2)
        all_ax = jnp.concatenate(
            [jnp.broadcast_to(ego_ax[None], (K, 2, 2)), npc_ax], axis=1
        )                                         # (K, 4, 2)
        proj_d = jnp.abs(jnp.einsum("kac,kc->ka", all_ax, d))
        r_ego = jnp.abs(
            jnp.einsum("kac,bc->kab", all_ax, ego_ax)
        ) @ he
        r_npc = jnp.einsum(
            "kab,b->ka", jnp.abs(jnp.einsum("kac,kbc->kab", all_ax, npc_ax)),
            he,
        )
        separated = jnp.any(proj_d > r_ego + r_npc, axis=1)
        hit = ~separated
        col_veh = jnp.any(hit)
        veh_id = jnp.argmax(hit).astype(jnp.int32)
        npc_vel = traffic.veh.speed[veh_id] * jnp.stack([
            jnp.cos(traffic.veh.yaw[veh_id]),
            jnp.sin(traffic.veh.yaw[veh_id]),
        ])
        veh_rel = jnp.linalg.norm(ego_vel - npc_vel)

    col_ped, ped_id, ped_rel = ez, zi, zf
    if W > 0:
        local = vec_global_to_ref(
            traffic.walker_xy - ego.xy[None, :], ego.yaw
        )
        inside = (
            (jnp.abs(local[:, 0]) < params.half_length + 0.4)
            & (jnp.abs(local[:, 1]) < params.half_width + 0.4)
        )
        col_ped = jnp.any(inside)
        ped_id = jnp.argmax(inside).astype(jnp.int32)
        w_vel = traffic.walker_speed[ped_id] * jnp.stack([
            jnp.cos(traffic.walker_yaw[ped_id]),
            jnp.sin(traffic.walker_yaw[ped_id]),
        ])
        ped_rel = jnp.linalg.norm(ego_vel - w_vel)

    return DynHits(col_veh, col_ped, veh_id, ped_id, veh_rel, ped_rel)


class CollisionEvents(NamedTuple):
    """Deduplicated per-tick collision events + updated sensor memory."""

    static: jnp.ndarray     # () bool layout/obstacle event
    veh: jnp.ndarray        # () bool vehicle event
    ped: jnp.ndarray        # () bool walker event
    any: jnp.ndarray        # () bool
    intensity: jnp.ndarray  # () f32 relative-speed intensity proxy
    col_xy: jnp.ndarray     # (2,) new registered location
    col_time: jnp.ndarray   # () new event time
    col_id: jnp.ndarray     # () i32 new remembered actor id


def dedup_events(ego, sim_time, raw_static, hits: DynHits, n_veh_slots,
                 col_xy, col_time, col_id) -> CollisionEvents:
    """Reference collision-sensor dedup (criteria/collision.py:27-47 +
    54-62): sustained contact is ONE event, not one per tick. A registered
    location suppresses events within 3 m and is forgotten once the ego
    moves 5 m away; the last hit actor id is remembered for 5 s (static
    actors never set the id, collision.py:110-112)."""
    d_prev = jnp.linalg.norm(ego.xy - col_xy)
    reg_xy = jnp.where(d_prev > 5.0, jnp.full((2,), 1e9), col_xy)
    near_prev = jnp.linalg.norm(ego.xy - reg_xy) <= 3.0
    id_live = (sim_time - col_time) <= 5.0
    veh_gid = 1 + hits.veh_id
    ped_gid = 1 + n_veh_slots + hits.ped_id
    ev_static = raw_static & ~near_prev
    ev_veh = hits.veh & ~near_prev & ~(id_live & (col_id == veh_gid))
    ev_ped = hits.ped & ~near_prev & ~(id_live & (col_id == ped_gid))
    ev_any = ev_static | ev_veh | ev_ped
    new_xy = jnp.where(ev_any, ego.xy, reg_xy)
    new_time = jnp.where(ev_any, sim_time, col_time)
    new_id = jnp.where(
        ev_veh, veh_gid, jnp.where(ev_ped, ped_gid, col_id)
    ).astype(jnp.int32)
    intensity = jnp.where(
        ev_veh, hits.veh_rel_speed,
        jnp.where(ev_ped, hits.ped_rel_speed,
                  jnp.where(ev_static, jnp.abs(ego.speed), 0.0)),
    )
    return CollisionEvents(
        ev_static, ev_veh, ev_ped, ev_any, intensity,
        new_xy, new_time, new_id,
    )
