"""WorldState: the complete per-env simulation state as one pytree.

The reference scatters this across a remote CARLA server plus a web of
handler objects (``TaskVehicle`` route/criteria state, ``ObsManager`` queues,
``EgoVehicleHandler`` curriculum fields). Here it is a single immutable
dataclass; ``jax.vmap`` over a batched WorldState is the framework's
equivalent of SubprocVecEnv's N worker processes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.agents.controllers import AutopilotState, make_autopilot
from gail_carla_tpu.sim.dynamics import VehicleState


@struct.dataclass
class TrafficState:
    """Background actors. Shapes (K, ...) / (W, ...) are static per config;
    K = 0 disables traffic. Zombie vehicles drive pre-compiled patrol routes
    with the same LocalPlanner/PID stack as the expert (the reference hands
    them to CARLA's TrafficManager, zombie_vehicle_handler.py:41-47; the
    in-repo behavioural spec for scripted driving is the scenario-actor
    BasicAgent, which is what we vmap here)."""

    veh: VehicleState              # (K,) batched vehicle states
    veh_patrol: jnp.ndarray        # (K,) i32 patrol route id
    veh_head: jnp.ndarray          # (K,) i32 patrol cursor
    veh_ap: AutopilotState         # (K,) LocalPlanner controller state
    veh_target_speed: jnp.ndarray  # (K,) f32
    walker_xy: jnp.ndarray         # (W, 2)
    walker_yaw: jnp.ndarray        # (W,)
    # Sidewalk-following state (the CARLA navmesh equivalent,
    # zombie_walker_handler.py:7-98): each walker tracks a lane polyline at
    # a signed lateral offset; crossings lerp the offset to the other side.
    walker_patrol: jnp.ndarray     # (W,) i32 lane polyline id
    walker_head: jnp.ndarray       # (W,) i32 polyline cursor
    walker_off: jnp.ndarray        # (W,) f32 current signed lateral offset
    walker_off_t: jnp.ndarray      # (W,) f32 target offset (sign flips = cross)
    walker_speed: jnp.ndarray      # (W,) 1-2 m/s (zombie_walker_handler.py)


@struct.dataclass
class HistoryState:
    """20-tick ring of dynamic-actor snapshots for the full BEV mask stack
    (replaces chauffeurnet.py:48's deque(maxlen=20)). Only allocated when
    EnvConfig.full_bev is on; slot 0 = oldest after ``idx`` rotations."""

    veh_pose: jnp.ndarray      # (20, K, 3) x, y, yaw
    walker_pose: jnp.ndarray   # (20, W, 3)
    tl_state: jnp.ndarray      # (20, T) i8 light states
    stop_active: jnp.ndarray   # (20, S) bool un-completed target stop signs
    idx: jnp.ndarray           # () i32 next write slot
    count: jnp.ndarray         # () i32 valid entries


def make_empty_history(n_veh, n_walkers, n_tl, n_ss) -> HistoryState:
    return HistoryState(
        veh_pose=jnp.zeros((20, n_veh, 3)),
        walker_pose=jnp.zeros((20, n_walkers, 3)),
        tl_state=jnp.zeros((20, n_tl), jnp.int8),
        stop_active=jnp.zeros((20, n_ss), bool),
        idx=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@struct.dataclass
class WorldState:
    # --- ego vehicle ---
    ego: VehicleState
    last_steer: jnp.ndarray        # () f32, for r_action (valeo_action.py:33-37)
    # --- route progress (task_vehicle.py) ---
    route_id: jnp.ndarray          # () i32
    head: jnp.ndarray              # () i32 dense-route cursor (route head)
    last_head: jnp.ndarray         # () i32 previous head (get_route_transform)
    start_idx: jnp.ndarray         # () i32 spawn index into the dense route
    s0: jnp.ndarray                # () f32 arc length at spawn
    route_len_ep: jnp.ndarray      # () f32 remaining-route length at spawn
    plan_idx: jnp.ndarray          # () i32 gnss target index (starts at -1)
    # --- criteria accumulators ---
    blocked_elapsed: jnp.ndarray   # () f32 s below speed threshold
    out_route_dist: jnp.ndarray    # () f32 metres travelled while off-route
    stop_target: jnp.ndarray       # () i32 active stop sign (-1 none)
    stop_completed: jnp.ndarray    # () bool stop satisfied for stop_target
    stop_affected: jnp.ndarray     # () bool entered the trigger volume
    encountered_light: jnp.ndarray  # () i32 last encountered light (-1 none)
    last_red_light: jnp.ndarray    # () i32 last light already scored (-1)
    last_cross_light: jnp.ndarray  # () i32 last stop line crossed, any colour
    # valeo terminal state (terminal/valeo.py:26-33)
    speed_q: jnp.ndarray           # (10,) f32 recent speeds ring
    speed_q_len: jnp.ndarray       # () i32
    stuck_counter: jnp.ndarray     # () i32
    last_lat_dist: jnp.ndarray     # () f32
    # --- collision-event dedup memory (criteria/collision.py:14-23:
    #     registered location ±3/5 m, last actor id remembered 5 s) ---
    col_xy: jnp.ndarray            # (2,) f32 last registered collision loc
    col_time: jnp.ndarray          # () f32 sim time of the last event
    col_id: jnp.ndarray            # () i32 last hit actor id (-1 none;
    #                                  1+k vehicles, 1+K+w walkers; static
    #                                  never sets it, collision.py:110-112)
    # --- episode infraction counters (ego_vehicle_handler.py:96-109) ---
    n_col_static: jnp.ndarray      # () i32 collisions_layout
    n_col_vehicle: jnp.ndarray     # () i32
    n_col_walker: jnp.ndarray      # () i32
    n_red: jnp.ndarray             # () i32 red lights run
    n_stop: jnp.ndarray            # () i32 stop signs run
    n_enc_light: jnp.ndarray      # () i32 lights encountered
    n_enc_stop: jnp.ndarray        # () i32 stop signs encountered
    outside_lane_m: jnp.ndarray    # () f32 metres outside driving lanes
    wrong_lane_m: jnp.ndarray      # () f32 metres in a wrong lane
    # --- episode bookkeeping ---
    step: jnp.ndarray              # () i32
    episode_reward: jnp.ndarray    # () f32
    last_total: jnp.ndarray        # () f32 last route-completion fraction
    # --- curriculum carry, persists across auto-resets
    #     (ego_vehicle_handler.py:55-78) ---
    resume_idx: jnp.ndarray        # () i32 route head when last episode ended
    completed_last: jnp.ndarray    # () bool last episode completed the route
    # --- randomness ---
    rng: jax.Array                 # PRNG key
    # --- traffic ---
    traffic: TrafficState = None
    # --- BEV actor history (None unless EnvConfig.full_bev) ---
    history: HistoryState = None


def make_empty_traffic(n_veh: int = 0, n_walkers: int = 0) -> TrafficState:
    ap0 = make_autopilot()
    return TrafficState(
        veh=VehicleState(
            xy=jnp.zeros((n_veh, 2)),
            yaw=jnp.zeros((n_veh,)),
            speed=jnp.zeros((n_veh,)),
        ),
        veh_patrol=jnp.zeros((n_veh,), jnp.int32),
        veh_head=jnp.zeros((n_veh,), jnp.int32),
        veh_ap=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_veh,) + a.shape), ap0
        ),
        veh_target_speed=jnp.full((n_veh,), 5.5),
        walker_xy=jnp.zeros((n_walkers, 2)),
        walker_yaw=jnp.zeros((n_walkers,)),
        walker_patrol=jnp.zeros((n_walkers,), jnp.int32),
        walker_head=jnp.zeros((n_walkers,), jnp.int32),
        walker_off=jnp.zeros((n_walkers,)),
        walker_off_t=jnp.zeros((n_walkers,)),
        walker_speed=jnp.ones((n_walkers,)),
    )
