"""The TPU-native driving environment: pure reset/step functions.

Replaces the reference stack L5-L9 (``carla_env.py`` -> ``carla_gym/
carla_multi_agent_env.py`` -> handlers -> CARLA server RPC) with pure
functions over (StaticScene, EnvConfig, WorldState). ``jax.vmap`` over the
WorldState batch replaces SubprocVecEnv; auto-reset on done happens inside
``step`` exactly like the reference worker (``vec_env/subproc_vec_env.py:
16-17``).

Semantics traced to the reference:
- route cursor advance + completion:  task_vehicle.py:103-138
- spawn curriculum:                   ego_vehicle_handler.py:55-78
- blocked / route-deviation criteria: criteria/blocked.py, route_deviation.py
- GNSS target & command:              obs_manager/navigation/gnss.py:96-116
- metrics 4-vector & Δ-completion reward: carla_env.py:140-153
- leaderboard terminal:               terminal/leaderboard.py
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.dynamics import (
    DEFAULT_VEHICLE, VehicleParams, VehicleState, step_vehicle,
)
from gail_carla_tpu.sim.state import WorldState, make_empty_traffic
from gail_carla_tpu.sim.transforms import (
    cast_angle, location_to_gps, vec_global_to_ref,
)

# 1 degree of the reference's equatorial Web-Mercator == R*pi/180 metres.
_METERS_PER_DEG = 111319.4907932736

# Route-cursor search window: task_vehicle.py:103 uses windows_size=5 and
# evaluates segments i = 0..5 inclusive.
_CURSOR_WINDOW = 6


@struct.dataclass
class RenderState:
    """Everything needed to (re-)render this step's policy observation.
    Rollouts store this instead of images; see ops/bev.py."""

    xy: jnp.ndarray        # (2,)
    yaw: jnp.ndarray       # ()
    route_id: jnp.ndarray  # () i32
    head: jnp.ndarray      # () i32 route cursor (start of the route band)


@struct.dataclass
class StepOutput:
    metrics: jnp.ndarray      # (4,) [target lat, target lon, speed, command]
    render: RenderState
    reward: jnp.ndarray       # ()
    done: jnp.ndarray         # () bool
    info: dict


def _route_pt(scene: StaticScene, route_id, idx):
    return scene.route_xy[route_id, idx]


def reset_env(
    scene: StaticScene,
    cfg: EnvConfig,
    rng: jax.Array,
    route_id: jnp.ndarray,
    resume_idx: jnp.ndarray = None,
    completed_last: jnp.ndarray = None,
) -> WorldState:
    """Spawn on the route with the reference's resume curriculum
    (ego_vehicle_handler.py:55-78): after completing the route (or in eval
    mode) restart at 0; otherwise with prob 0.1 restart at a random route
    point; otherwise resume from where the last episode ended."""
    rng, k_restart, k_pos = jax.random.split(rng, 3)
    n = scene.route_n[route_id]
    if resume_idx is None:
        resume_idx = jnp.zeros((), jnp.int32)
    if completed_last is None:
        completed_last = jnp.ones((), bool)

    random_restart = (
        jax.random.uniform(k_restart) < cfg.random_restart_prob
    )
    random_idx = jnp.minimum(
        (jax.random.uniform(k_pos) * 0.9 * n.astype(jnp.float32)).astype(
            jnp.int32
        ),
        n - 2,
    )
    start = jnp.where(
        (~jnp.asarray(cfg.train)) | completed_last,
        0,
        jnp.where(random_restart, random_idx, resume_idx),
    ).astype(jnp.int32)
    # never spawn so close to the end that the episode is trivial
    start = jnp.clip(start, 0, jnp.maximum(n - 20, 0))

    s0 = scene.route_s[route_id, start]
    route_len_ep = jnp.maximum(
        scene.route_len_m[route_id] - s0, 1e-3
    )
    ego = VehicleState(
        xy=scene.route_xy[route_id, start],
        yaw=scene.route_yaw[route_id, start],
        speed=jnp.zeros(()),
    )
    z = jnp.zeros(())
    zi = jnp.zeros((), jnp.int32)
    return WorldState(
        ego=ego,
        last_steer=z,
        route_id=route_id.astype(jnp.int32),
        head=start,
        last_head=start,
        start_idx=start,
        s0=s0,
        route_len_ep=route_len_ep,
        plan_idx=jnp.full((), -1, jnp.int32),
        blocked_elapsed=z,
        out_route_dist=z,
        stop_target=jnp.full((), -1, jnp.int32),
        stop_completed=jnp.zeros((), bool),
        encountered_light=jnp.full((), -1, jnp.int32),
        ran_light=jnp.zeros((), bool),
        ran_stop=jnp.zeros((), bool),
        n_collisions=zi,
        step=zi,
        episode_reward=z,
        last_total=z,
        resume_idx=resume_idx.astype(jnp.int32),
        completed_last=completed_last,
        rng=rng,
        traffic=make_empty_traffic(cfg.n_npc_vehicles, cfg.n_npc_walkers),
    )


def _advance_cursor(scene: StaticScene, state: WorldState, ego_xy):
    """task_vehicle._truncate_global_route_till_local_target: walk the route
    head forward past every segment whose direction has positive dot with
    the vehicle offset, within a fixed window."""
    rid, head = state.route_id, state.head
    n = scene.route_n[rid]
    offs = jnp.arange(_CURSOR_WINDOW)
    # contiguous window via dynamic_slice (gather-free; route rows are
    # padded with the final point so reads past n-1 are degenerate)
    win = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, _CURSOR_WINDOW + 1, 2)
    )[0]
    p0 = win[:-1]
    p1 = win[1:]
    wp_dir = p1 - p0
    wp_veh = ego_xy[None, :] - p0
    dot = jnp.sum(wp_dir * wp_veh, axis=-1)
    valid = (head + offs) < (n - 1)
    adv = jnp.max(jnp.where((dot > 0) & valid, offs + 1, 0))
    new_head = jnp.minimum(head + adv, n - 1)
    dist = scene.route_s[rid, new_head] - scene.route_s[rid, head]
    last_head = jnp.where(adv > 0, head, state.last_head)
    return new_head, last_head, dist


def _advance_plan(scene, cfg: EnvConfig, rng, ego, rid, plan_idx):
    """gnss.py:96-116: advance the leaderboard-plan target when the (noisy)
    GNSS fix says it is within 12 m and behind; derive the command with the
    lane-change carry rule."""
    noise = (
        jax.random.normal(rng, (2,)) * cfg.gnss_noise_deg * _METERS_PER_DEG
    )
    noisy_xy = ego.xy + noise
    pn = scene.plan_n[rid]
    nxt = scene.plan_xy[rid, jnp.minimum(plan_idx + 1, pn - 1)]
    local = vec_global_to_ref(nxt - noisy_xy, ego.yaw)
    advance = (jnp.linalg.norm(local) < cfg.target_advance_dist) & (
        local[0] < 0.0
    )
    idx = jnp.minimum(plan_idx + advance.astype(jnp.int32), pn - 2)

    opt0 = scene.plan_cmd[rid, jnp.maximum(idx, 0)]
    opt1 = scene.plan_cmd[rid, jnp.minimum(idx + 1, pn - 1)]
    is_lc0 = (opt0 == 5) | (opt0 == 6)
    is_lc1 = (opt1 == 5) | (opt1 == 6)
    command = jnp.where(is_lc0 & (~is_lc1), opt1, opt0)
    target_gps = scene.plan_gps[rid, jnp.minimum(idx + 1, pn - 1)]
    return idx, command, target_gps


def _observe(scene, cfg: EnvConfig, state: WorldState):
    """Metrics 4-vector (carla_env.py:140-144) + render state. Mutates
    plan_idx/rng (the reference advances the target inside
    ``get_observation`` once per tick)."""
    rng, k = jax.random.split(state.rng)
    plan_idx, command, target_gps = _advance_plan(
        scene, cfg, k, state.ego, state.route_id, state.plan_idx
    )
    speed = jnp.abs(state.ego.speed)
    metrics = jnp.stack(
        [target_gps[0], target_gps[1], speed, command.astype(jnp.float32)]
    )
    render = RenderState(
        xy=state.ego.xy,
        yaw=state.ego.yaw,
        route_id=state.route_id,
        head=state.head,
    )
    state = state.replace(plan_idx=plan_idx, rng=rng)
    return state, metrics, render


def observe(scene, cfg: EnvConfig, state: WorldState):
    """Public: (state', metrics, render) — call after reset, and step calls
    it internally each tick."""
    return _observe(scene, cfg, state)


def _static_collision(scene, params: VehicleParams, ego: VehicleState):
    """Stand-in for CARLA's collision sensor against layout
    (criteria/collision.py): fires when the vehicle body has fully left the
    drivable surface (all four bounding-box corners farther from every road
    capsule than the lane half-width — same geometry the BEV renderer and
    the offline rasterizer use)."""
    from gail_carla_tpu.ops.bev import capsule_min_dist2, fetch_cell

    c, s = jnp.cos(ego.yaw), jnp.sin(ego.yaw)
    f = jnp.stack([c, s]) * params.half_length
    r = jnp.stack([-s, c]) * params.half_width
    corners = ego.xy[None, :] + jnp.stack(
        [f + r, f - r, -f + r, -f - r], axis=0
    )
    road_segs, _, _ = fetch_cell(scene, ego.xy)
    d2 = capsule_min_dist2(corners, road_segs)
    on_road = d2 <= scene.half_lane**2
    return ~jnp.any(on_road)


def step_env(
    scene: StaticScene,
    cfg: EnvConfig,
    state: WorldState,
    action: jnp.ndarray,
    params: VehicleParams = DEFAULT_VEHICLE,
) -> Tuple[WorldState, StepOutput]:
    """One synchronous world tick. ``action`` = (steer, throttle) like
    ``carla_env.py:120-126``. Auto-resets on done and returns the *new*
    episode's observation with the finished episode's reward/done/info,
    mirroring the SubprocVecEnv worker."""
    steer, throttle = action[0], action[1]
    ego = step_vehicle(state.ego, steer, throttle, 0.0, cfg.dt, params)

    head, last_head, dist_traveled = _advance_cursor(scene, state, ego.xy)
    rid = state.route_id
    n = scene.route_n[rid]
    route_completed = scene.route_s[rid, head] - state.s0
    total = route_completed / state.route_len_ep

    # --- criteria ---
    speed = jnp.abs(ego.speed)
    blocked_elapsed = jnp.where(
        speed < cfg.blocked_speed, state.blocked_elapsed + cfg.dt, 0.0
    )
    c_blocked = blocked_elapsed > cfg.blocked_time

    head_xy = scene.route_xy[rid, head]
    dev = jnp.linalg.norm(ego.xy - head_xy)
    out_route_dist = state.out_route_dist + jnp.where(
        dev > cfg.deviation_min, dist_traveled, 0.0
    )
    c_deviation = (dev > cfg.deviation_max) | (
        out_route_dist / state.route_len_ep > cfg.deviation_pct
    )

    end_xy = scene.route_xy[rid, n - 1]
    c_route = (total > cfg.completion_pct) & (
        jnp.linalg.norm(ego.xy - end_xy) < cfg.completion_dist
    )

    c_collision = _static_collision(scene, params, ego)
    n_collisions = state.n_collisions + c_collision.astype(jnp.int32)

    step_count = state.step + 1
    c_timeout = step_count >= cfg.max_steps

    done = c_route | c_blocked | c_deviation | c_collision | c_timeout

    # --- reward: Δ route completion (carla_env.py:148-153) ---
    reward = total - state.last_total
    episode_reward = state.episode_reward + reward

    # --- curriculum carry (persists through the auto-reset) ---
    resume_idx = jnp.where(done, head, state.resume_idx)
    completed_last = jnp.where(done, c_route, state.completed_last)

    cont = state.replace(
        ego=ego,
        last_steer=steer,
        head=head,
        last_head=last_head,
        blocked_elapsed=blocked_elapsed,
        out_route_dist=out_route_dist,
        n_collisions=n_collisions,
        step=step_count,
        episode_reward=episode_reward,
        last_total=total,
        resume_idx=resume_idx,
        completed_last=completed_last,
    )

    rng_next, k_reset = jax.random.split(state.rng)
    cont = cont.replace(rng=rng_next)
    fresh = reset_env(scene, cfg, k_reset, rid, resume_idx, completed_last)
    # done is a scalar, so jnp.where broadcasts against every leaf shape
    next_state = jax.tree.map(
        lambda a, b: jnp.where(done, b, a), cont, fresh
    )

    next_state, metrics, render = _observe(scene, cfg, next_state)

    info = {
        "route_completed": c_route,
        "blocked": c_blocked,
        "route_deviation": c_deviation,
        "collision": c_collision,
        "timeout": c_timeout,
        "episode_reward": episode_reward,
        "episode_length": step_count,
        "route_id": rid,
        "route_completed_in_m": route_completed,
        "route_length_in_m": state.route_len_ep,
    }
    return next_state, StepOutput(
        metrics=metrics, render=render,
        reward=reward, done=done, info=info,
    )


# ---------------------------------------------------------------------------
# Batched API (the SubprocVecEnv replacement)
# ---------------------------------------------------------------------------

def reset_batch(scene, cfg: EnvConfig, rng, route_ids):
    """Create N worlds. Route assignment = caller's choice; the reference
    round-robins ``routes[env_id % len(routes)]`` (tools/envs.py:29-33)."""
    keys = jax.random.split(rng, route_ids.shape[0])
    states = jax.vmap(lambda k, r: reset_env(scene, cfg, k, r))(
        keys, route_ids
    )
    states, metrics, render = jax.vmap(
        lambda s: _observe(scene, cfg, s)
    )(states)
    return states, metrics, render


def step_batch(scene, cfg: EnvConfig, states, actions):
    return jax.vmap(lambda s, a: step_env(scene, cfg, s, a))(states, actions)
