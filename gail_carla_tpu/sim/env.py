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
from gail_carla_tpu.sim.collisions import (
    dedup_events, dynamic_collisions, obstacle_collision, static_collision,
)
from gail_carla_tpu.sim.cursor import (
    advance_cursor, advance_plan, route_transform,
)
from gail_carla_tpu.sim.state import WorldState, make_empty_history
from gail_carla_tpu.sim.traffic import reset_traffic, step_traffic
from gail_carla_tpu.sim.transforms import vec_global_to_ref


@struct.dataclass
class RenderState:
    """Everything needed to (re-)render this step's policy observation.
    Rollouts store this instead of images; see ops/bev.py.

    The signal/actor fields exist for the 6-channel ``bev6`` observation
    (lights + dynamic actors visible to the policy — the capability the
    reference's mask-0-only obs lacks); with zero NPCs they cost 2 ints."""

    xy: jnp.ndarray        # (2,)
    yaw: jnp.ndarray       # ()
    route_id: jnp.ndarray  # () i32
    head: jnp.ndarray      # () i32 route cursor (start of the route band)
    step: jnp.ndarray      # () i32 sim step (light phase = f(step * dt))
    stop_idx: jnp.ndarray  # () i32 active un-completed stop sign, -1 none
    npc_pose: jnp.ndarray = None     # (K, 3) x, y, yaw
    walker_pose: jnp.ndarray = None  # (W, 3)


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
    rng, k_restart, k_pos, k_traffic = jax.random.split(rng, 4)
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
        stop_affected=jnp.zeros((), bool),
        encountered_light=jnp.full((), -1, jnp.int32),
        last_red_light=jnp.full((), -1, jnp.int32),
        last_cross_light=jnp.full((), -1, jnp.int32),
        speed_q=jnp.zeros((10,)),
        speed_q_len=zi,
        stuck_counter=zi,
        last_lat_dist=z,
        col_xy=jnp.full((2,), 1e9),
        col_time=jnp.full((), -1e9),
        col_id=jnp.full((), -1, jnp.int32),
        n_col_static=zi,
        n_col_vehicle=zi,
        n_col_walker=zi,
        n_red=zi,
        n_stop=zi,
        n_enc_light=zi,
        n_enc_stop=zi,
        outside_lane_m=z,
        wrong_lane_m=z,
        step=zi,
        episode_reward=z,
        last_total=z,
        resume_idx=resume_idx.astype(jnp.int32),
        completed_last=completed_last,
        rng=rng,
        traffic=reset_traffic(scene, cfg, k_traffic, ego.xy, route_id),
        history=(
            make_empty_history(
                cfg.n_npc_vehicles + cfg.n_scenario_actors,
                cfg.n_npc_walkers,
                scene.tl_stop.shape[0], scene.ss_center.shape[0],
            )
            if cfg.full_bev else None
        ),
    )


def _observe(scene, cfg: EnvConfig, state: WorldState):
    """Metrics 4-vector (carla_env.py:140-144) + render state. Mutates
    plan_idx/rng (the reference advances the target inside
    ``get_observation`` once per tick)."""
    rng, k = jax.random.split(state.rng)
    plan_idx, command, target_gps = advance_plan(
        scene, cfg, k, state.ego, state.route_id, state.plan_idx
    )
    speed = jnp.abs(state.ego.speed)
    metrics = jnp.stack(
        [target_gps[0], target_gps[1], speed, command.astype(jnp.float32)]
    )
    t = state.traffic
    render = RenderState(
        xy=state.ego.xy,
        yaw=state.ego.yaw,
        route_id=state.route_id,
        head=state.head,
        step=state.step,
        stop_idx=jnp.where(
            state.stop_completed, -1, state.stop_target
        ).astype(jnp.int32),
        npc_pose=jnp.concatenate(
            [t.veh.xy, t.veh.yaw[:, None]], axis=1
        ),
        walker_pose=jnp.concatenate(
            [t.walker_xy, t.walker_yaw[:, None]], axis=1
        ),
    )
    state = state.replace(plan_idx=plan_idx, rng=rng)
    return state, metrics, render


def observe(scene, cfg: EnvConfig, state: WorldState):
    """Public: (state', metrics, render) — call after reset, and step calls
    it internally each tick."""
    return _observe(scene, cfg, state)


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
    from gail_carla_tpu.ops.bev import fetch_cell, fetch_hard_cell
    from gail_carla_tpu.sim import criteria as crit
    from gail_carla_tpu.sim import rewards as rew
    from gail_carla_tpu.sim import signals
    from gail_carla_tpu.sim import terminals as term

    # (steer, throttle) per carla_env.py:120-126, or (steer, throttle,
    # brake) per the multi-agent action space (carla_multi_agent_env.py:
    # 42-46) — shape decided statically
    # --- endless target extension (task_vehicle.py:67-82,143-145): when
    #     the route row is nearly exhausted, chain onto the next row whose
    #     start pose equals this row's end pose; completed metres and the
    #     episode route length both accumulate, so the route never ends ---
    if cfg.endless_extension and scene.endless_next is not None:
        rid0 = state.route_id
        n_cur = scene.route_n[rid0]
        rid_next = scene.endless_next[rid0]
        # switch at the row end (the next row starts at this row's end
        # pose, so cursor/deviation stay continuous); endless episodes
        # never complete the route — c_route is disabled below
        switch = (state.head >= n_cur - 2) & (rid_next != rid0)
        completed_so_far = scene.route_s[rid0, state.head] - state.s0
        state = state.replace(
            route_id=jnp.where(switch, rid_next, rid0),
            head=jnp.where(switch, 0, state.head),
            last_head=jnp.where(switch, 0, state.last_head),
            s0=jnp.where(switch, -completed_so_far, state.s0),
            route_len_ep=jnp.where(
                switch,
                state.route_len_ep + scene.route_len_m[rid_next],
                state.route_len_ep,
            ),
            plan_idx=jnp.where(switch, -1, state.plan_idx),
        )

    steer, throttle = action[0], action[1]
    brake = action[2] if action.shape[0] > 2 else jnp.zeros(())
    ego = step_vehicle(state.ego, steer, throttle, brake, cfg.dt, params)

    head, last_head, dist_traveled = advance_cursor(scene, state, ego.xy)
    rid = state.route_id
    n = scene.route_n[rid]
    route_completed = scene.route_s[rid, head] - state.s0
    total = route_completed / state.route_len_ep
    step_count = state.step + 1
    sim_time = step_count.astype(jnp.float32) * cfg.dt
    speed = jnp.abs(ego.speed)

    # --- background traffic tick (scenario_actor/zombie handlers run
    #     before/with world.tick in carla_multi_agent_env.py:109-115) ---
    rng_next, k_reset, k_npc = jax.random.split(state.rng, 3)
    traffic = step_traffic(
        scene, cfg, state.traffic, ego, sim_time, k_npc
    )
    state = state.replace(traffic=traffic)

    # --- core criteria (blocked / deviation / completion / timeout) ---
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
    if cfg.endless_extension:
        # endless tasks have no route end (endless_env.py:4-56; success is
        # surviving to max_time, terminal/valeo.py:92-96)
        c_route = jnp.zeros((), bool)
    c_timeout = step_count >= cfg.max_steps

    # --- collisions (one shared spatial-hash fetch per step) ---
    road_segs, road_flag, _, _, _ = fetch_cell(scene, ego.xy)
    hard_segs, _ = fetch_hard_cell(scene, ego.xy)
    raw_static = static_collision(
        scene, params, ego, hard_segs, dmax=scene.hard_dmax
    ) | obstacle_collision(scene, params, ego)
    hits = dynamic_collisions(state.traffic, params, ego)
    ev = dedup_events(
        ego, sim_time, raw_static, hits, traffic.veh.yaw.shape[0],
        state.col_xy, state.col_time, state.col_id,
    )
    c_collision_static = ev.static
    c_col_veh = ev.veh
    c_col_ped = ev.ped
    c_collision = ev.any
    col_xy, col_time, col_id = ev.col_xy, ev.col_time, ev.col_id
    collision_intensity = ev.intensity

    # --- signal criteria ---
    tl_states = signals.light_states(scene, sim_time)
    last_red_light, last_cross_light, ran_red = crit.run_red_light(
        scene, params, ego, tl_states, state.last_red_light,
        state.last_cross_light,
    )
    route_pts = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, 20, 2)
    )[0]
    ss_state, enc_stop, ran_stop = crit.run_stop_sign(
        scene, ego, route_pts, scene.route_yaw[rid, head],
        crit.StopSignState(
            state.stop_target, state.stop_completed, state.stop_affected
        ),
    )
    encountered_light, enc_light = crit.encounter_light(
        scene, ego, tl_states, state.encountered_light
    )
    outside_lane, wrong_lane = crit.outside_route_lane(
        scene, ego, road_segs, road_flag
    )

    # --- valeo terminal state (terminal/valeo.py:37-72) ---
    light_state, light_loc, light_idx = signals.affecting_light(
        scene, ego.xy, ego.yaw, tl_states,
        offset=-0.8 * params.half_length, dist_threshold=18.0,
    )
    veh_found, _ = rew.hazard_vehicle(state.traffic, ego.xy, ego.yaw)
    ped_found, _ = rew.hazard_walker(state.traffic, ego.xy, ego.yaw)
    is_free_road = (~veh_found) & (~ped_found) & (
        (light_idx < 0) | (light_state == signals.GREEN)
    )
    speed_q = jnp.roll(state.speed_q, 1).at[0].set(speed)
    speed_q_len = jnp.minimum(state.speed_q_len + 1, 10)
    speed_mean = jnp.sum(speed_q) / jnp.maximum(speed_q_len, 1)
    stuck_counter = jnp.where(
        speed_mean >= 1.0, 0,
        state.stuck_counter + (is_free_road & (speed_mean < 1.0)),
    ).astype(jnp.int32)
    c_stuck = stuck_counter >= cfg.stuck_steps

    route_tf_xy, route_tf_yaw = route_transform(
        scene, rid, head, last_head
    )
    d_vec = ego.xy - route_tf_xy
    right = jnp.stack([-jnp.sin(route_tf_yaw), jnp.cos(route_tf_yaw)])
    lat_dist = jnp.abs(jnp.sum(right * d_vec))
    thresh_lat = jnp.where(
        lat_dist - state.last_lat_dist > 0.8,
        lat_dist + 0.5,
        jnp.maximum(cfg.lat_dist_thresh, state.last_lat_dist),
    )
    c_lat_dist = lat_dist > thresh_lat + 1e-2

    # --- terminal handler ---
    flags = term.CriteriaFlags(
        c_route=c_route, c_blocked=c_blocked, c_deviation=c_deviation,
        c_collision=c_collision, c_run_red=ran_red, c_run_stop=ran_stop,
        c_collision_px=hits.ped, c_stuck=c_stuck, c_lat_dist=c_lat_dist,
        timeout=c_timeout,
    )
    tout = term.compute_terminal(
        cfg.terminal_mode, flags, speed, cfg.exploration_suggest
    )
    done = tout.done

    # --- infraction counters (for leaderboard episode_stat) ---
    n_col_static = state.n_col_static + c_collision_static
    n_col_vehicle = state.n_col_vehicle + c_col_veh
    n_col_walker = state.n_col_walker + c_col_ped
    n_red = state.n_red + ran_red
    n_stop = state.n_stop + ran_stop
    n_enc_light = state.n_enc_light + enc_light
    n_enc_stop = state.n_enc_stop + enc_stop
    outside_lane_m = state.outside_lane_m + jnp.where(
        outside_lane, dist_traveled, 0.0
    )
    wrong_lane_m = state.wrong_lane_m + jnp.where(
        wrong_lane, dist_traveled, 0.0
    )

    # --- reward ---
    delta_reward = total - state.last_total
    if cfg.reward_mode == "valeo" or cfg.compute_valeo_reward:
        ss_active = (ss_state.target >= 0) & (~ss_state.completed)
        tgt = jnp.maximum(ss_state.target, 0)
        stop_dist = jnp.linalg.norm(scene.ss_center[tgt] - ego.xy)
        valeo_reward, desired_speed = rew.valeo_action_reward(
            state.traffic,
            rew.ValeoInputs(
                ego_xy=ego.xy, ego_yaw=ego.yaw, ego_speed=speed,
                steer=steer, last_steer=state.last_steer,
                route_tf_xy=route_tf_xy, route_tf_yaw=route_tf_yaw,
                light_state=light_state,
                light_dist=jnp.linalg.norm(light_loc),
                stop_dist=stop_dist, has_stop=ss_active,
                terminal_reward=tout.terminal_reward,
            ),
        )
    else:
        valeo_reward = jnp.zeros(())
        desired_speed = jnp.zeros(())
    reward = (
        valeo_reward if cfg.reward_mode == "valeo" else delta_reward
    )
    episode_reward = state.episode_reward + reward

    # --- BEV history ring (chauffeurnet.py:105-133) ---
    if cfg.full_bev:
        from gail_carla_tpu.ops.bev_full import push_history

        S = scene.ss_center.shape[0]
        stop_active = (
            (jnp.arange(S) == ss_state.target) & (~ss_state.completed)
        )
        veh_pose = jnp.concatenate(
            [traffic.veh.xy, traffic.veh.yaw[:, None]], axis=1
        )
        walker_pose = jnp.concatenate(
            [traffic.walker_xy, traffic.walker_yaw[:, None]], axis=1
        )
        history = push_history(
            state.history, veh_pose, walker_pose, tl_states, stop_active
        )
        state = state.replace(history=history)

    # --- leaderboard episode stats (ego_vehicle_handler.py:208-248) ---
    score_route = jnp.clip(total, 0.0, 1.0) * 100.0
    score_penalty = (
        0.50 ** n_col_walker
        * 0.60 ** n_col_vehicle
        * 0.65 ** n_col_static
        * 0.70 ** n_red
        * 0.80 ** n_stop
    )
    km = jnp.maximum(route_completed, 1.0) / 1000.0

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
        stop_target=ss_state.target,
        stop_completed=ss_state.completed,
        stop_affected=ss_state.affected,
        encountered_light=encountered_light,
        last_red_light=last_red_light,
        last_cross_light=last_cross_light,
        speed_q=speed_q,
        speed_q_len=speed_q_len,
        stuck_counter=stuck_counter,
        last_lat_dist=lat_dist,
        col_xy=col_xy,
        col_time=col_time,
        col_id=col_id,
        n_col_static=n_col_static,
        n_col_vehicle=n_col_vehicle,
        n_col_walker=n_col_walker,
        n_red=n_red,
        n_stop=n_stop,
        n_enc_light=n_enc_light,
        n_enc_stop=n_enc_stop,
        outside_lane_m=outside_lane_m,
        wrong_lane_m=wrong_lane_m,
        step=step_count,
        episode_reward=episode_reward,
        last_total=total,
        resume_idx=resume_idx,
        completed_last=completed_last,
    )

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
        "collision_vehicle": c_col_veh,
        "collision_walker": c_col_ped,
        "collision_intensity": collision_intensity,
        "run_red_light": ran_red,
        "run_stop_sign": ran_stop,
        "encounter_light": enc_light,
        "encounter_stop": enc_stop,
        "outside_lane": outside_lane,
        "wrong_lane": wrong_lane,
        "timeout": c_timeout,
        "episode_reward": episode_reward,
        "episode_length": step_count,
        "route_id": rid,
        "route_completed_in_m": route_completed,
        "route_length_in_m": state.route_len_ep,
        "valeo_reward": valeo_reward,
        "desired_speed": desired_speed,
        "terminal_reward": tout.terminal_reward,
        "exploration_suggest_steps": tout.suggest_steps,
        "exploration_suggest_go": tout.suggest_go,
        "exploration_suggest_stop": tout.suggest_stop,
        "exploration_suggest_turn": tout.suggest_turn,
        # leaderboard episode_stat (valid at done)
        "score_route": score_route,
        "score_penalty": score_penalty * 100.0,
        "score_composed": score_route * score_penalty,
        "n_collisions_layout": n_col_static,
        "n_collisions_vehicle": n_col_vehicle,
        "n_collisions_walker": n_col_walker,
        "n_red_light": n_red,
        "n_stop_sign": n_stop,
        "red_light_per_km": n_red.astype(jnp.float32) / km,
        "stop_sign_per_km": n_stop.astype(jnp.float32) / km,
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
