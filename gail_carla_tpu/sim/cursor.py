"""Route-cursor and leaderboard-plan progression.

Ports of the reference's per-tick route bookkeeping:
- ``advance_cursor``: task_vehicle._truncate_global_route_till_local_target
  (task_vehicle.py:103-128) — window-5 dot-product forward walk;
- ``route_transform``: task_vehicle.get_route_transform
  (task_vehicle.py:217-227);
- ``advance_plan``: the gnss ObsManager's target tracker + command carry
  rule (navigation/gnss.py:96-116).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.transforms import vec_global_to_ref

# 1 degree of the reference's equatorial Web-Mercator == R*pi/180 metres.
METERS_PER_DEG = 111319.4907932736

# Route-cursor search window: task_vehicle.py:103 uses windows_size=5 and
# evaluates segments i = 0..5 inclusive.
CURSOR_WINDOW = 6


def advance_cursor(scene: StaticScene, state, ego_xy):
    """Walk the route head forward past every segment whose direction has
    positive dot with the vehicle offset, within a fixed window."""
    rid, head = state.route_id, state.head
    n = scene.route_n[rid]
    offs = jnp.arange(CURSOR_WINDOW)
    # contiguous window via dynamic_slice (gather-free; route rows are
    # padded with the final point so reads past n-1 are degenerate)
    win = jax.lax.dynamic_slice(
        scene.route_xy, (rid, head, 0), (1, CURSOR_WINDOW + 1, 2)
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


def route_transform(scene, rid, head, last_head):
    """Pose of the last passed route point, heading toward the current
    head."""
    loc0 = scene.route_xy[rid, last_head]
    loc1 = scene.route_xy[rid, head]
    d = loc1 - loc0
    dist = jnp.linalg.norm(d)
    yaw = jnp.where(
        dist < 0.1,
        scene.route_yaw[rid, head],
        jnp.arctan2(d[1], d[0]),
    )
    return loc0, yaw


def advance_plan(scene, cfg: EnvConfig, rng, ego, rid, plan_idx):
    """gnss.py:96-116: advance the leaderboard-plan target when the (noisy)
    GNSS fix says it is within 12 m and behind; derive the command with the
    lane-change carry rule."""
    noise = (
        jax.random.normal(rng, (2,)) * cfg.gnss_noise_deg * METERS_PER_DEG
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
