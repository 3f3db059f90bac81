"""Terminal (done) handlers — ports of ``carla_gym/core/task_actor/
ego_vehicle/terminal/*``. Selected statically via EnvConfig.terminal_mode:

- "leaderboard" (leaderboard.py — the one CarlaEnv trains with,
  carla_env.py:68-72): done on route completion / blocked / deviation /
  collision / timeout, terminal reward 0.
- "valeo" (valeo.py): stuck counter, adaptive lateral distance, red light /
  stop sign / collision with -speed terminal reward, exploration suggest.
- "valeo_nodetpx" (valeo_no_det_px.py): valeo plus pixel-level walker
  collision (collision_px from the BEV, chauffeurnet.py:209).
- "leaderboard_dagger" (leaderboard_dagger.py): leaderboard plus optional
  red-light/stop-sign termination toggles.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CriteriaFlags(NamedTuple):
    c_route: jnp.ndarray        # route completed
    c_blocked: jnp.ndarray
    c_deviation: jnp.ndarray
    c_collision: jnp.ndarray
    c_run_red: jnp.ndarray      # red light run this step
    c_run_stop: jnp.ndarray     # stop sign run this step
    c_collision_px: jnp.ndarray  # BEV walker-overlap collision
    c_stuck: jnp.ndarray        # valeo stuck counter tripped
    c_lat_dist: jnp.ndarray     # valeo adaptive lateral distance tripped
    timeout: jnp.ndarray


class TerminalOut(NamedTuple):
    done: jnp.ndarray
    terminal_reward: jnp.ndarray
    # exploration suggest (valeo.py:106-117): n_steps, go/stop/turn flags
    suggest_steps: jnp.ndarray
    suggest_go: jnp.ndarray
    suggest_stop: jnp.ndarray
    suggest_turn: jnp.ndarray


def _no_suggest():
    z = jnp.zeros((), jnp.int32)
    f = jnp.zeros((), bool)
    return z, f, f, f


def leaderboard(f: CriteriaFlags, ego_speed) -> TerminalOut:
    done = (
        f.c_route | f.c_blocked | f.c_deviation | f.c_collision | f.timeout
    )
    return TerminalOut(done, jnp.zeros(()), *_no_suggest())


def valeo(
    f: CriteriaFlags, ego_speed, exploration_suggest: bool = True,
    with_px: bool = False,
) -> TerminalOut:
    c_col = f.c_collision | (with_px & f.c_collision_px)
    infraction = f.c_run_red | c_col | f.c_run_stop
    done = (
        f.c_stuck | f.c_lat_dist | infraction | f.c_blocked | f.timeout
    )
    terminal_reward = jnp.where(done, -1.0, 0.0) + jnp.where(
        infraction, -jnp.abs(ego_speed), 0.0
    )
    steps = jnp.where(done, 100, 0).astype(jnp.int32)
    if not exploration_suggest:
        steps = jnp.zeros((), jnp.int32)
    go = (f.c_stuck | f.c_blocked) & done
    stop = infraction
    turn = f.c_lat_dist
    return TerminalOut(done, terminal_reward, steps, go, stop, turn)


def leaderboard_dagger(
    f: CriteriaFlags, ego_speed,
    terminate_on_red: bool = True, terminate_on_stop: bool = True,
) -> TerminalOut:
    done = (
        f.c_route | f.c_blocked | f.c_deviation | f.c_collision | f.timeout
    )
    if terminate_on_red:
        done = done | f.c_run_red
    if terminate_on_stop:
        done = done | f.c_run_stop
    infraction = f.c_run_red | f.c_collision | f.c_run_stop
    terminal_reward = jnp.where(infraction, -jnp.abs(ego_speed), 0.0)
    return TerminalOut(done, terminal_reward, *_no_suggest())


def compute_terminal(mode: str, f: CriteriaFlags, ego_speed,
                     exploration_suggest: bool = True) -> TerminalOut:
    if mode == "leaderboard":
        return leaderboard(f, ego_speed)
    if mode == "valeo":
        return valeo(f, ego_speed, exploration_suggest, with_px=False)
    if mode == "valeo_nodetpx":
        return valeo(f, ego_speed, exploration_suggest, with_px=True)
    if mode == "leaderboard_dagger":
        return leaderboard_dagger(f, ego_speed)
    raise ValueError(f"unknown terminal mode {mode!r}")
