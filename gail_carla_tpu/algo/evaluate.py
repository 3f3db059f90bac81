"""Deterministic policy evaluation (the reference's eval pass,
``tools/learn.py:225-258``, and ``tools/evaluation.py``): run the policy with
deterministic actions and report episode reward / length / completion plus
the leaderboard scoring fields (``ego_vehicle_handler.py:208-248``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.algo.rollout import _obs_batch
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.models import policy as policy_mod
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import reset_batch, step_batch

_LATCH_KEYS = (
    ("reward", "episode_reward", jnp.float32),
    ("length", "episode_length", jnp.int32),
    ("completed", "route_completed", bool),
    ("score_route", "score_route", jnp.float32),
    ("score_penalty", "score_penalty", jnp.float32),
    ("score_composed", "score_composed", jnp.float32),
    ("n_red_light", "n_red_light", jnp.int32),
    ("n_stop_sign", "n_stop_sign", jnp.int32),
    ("red_light_per_km", "red_light_per_km", jnp.float32),
    ("collision", "collision", bool),
)


def evaluate_policy(
    scene: StaticScene,
    env_cfg: EnvConfig,
    net,
    params,
    rng,
    route_id=None,
    n_envs: int = 1,
    max_steps: int = 2400,
    route_ids=None,
):
    """Returns dict of (n_envs,) arrays for the FIRST episode finished in
    each env (episodes auto-reset; we latch the first done).

    Pass either a scalar ``route_id`` (all envs on that route — the
    reference's held-out-route eval) or a ``route_ids`` array (one env per
    route — the leaderboard-table eval)."""
    # eval always scores under LEADERBOARD termination so driving scores
    # stay comparable across training terminal modes (a dagger-terminated
    # eval would truncate score_route at the first red light)
    eval_cfg = env_cfg.__class__(
        **{**env_cfg.__dict__, "train": False,
           "terminal_mode": "leaderboard"}
    )
    if route_ids is None:
        route_ids = jnp.full((n_envs,), route_id, jnp.int32)
    else:
        route_ids = jnp.asarray(route_ids, jnp.int32)
        n_envs = route_ids.shape[0]
    states, metrics, render = reset_batch(scene, eval_cfg, rng, route_ids)

    def body(carry, _):
        st, metrics, render, latched = carry
        obs = _obs_batch(scene, eval_cfg, render, metrics)
        _, action, _ = policy_mod.act(
            net, params, obs, metrics, jax.random.PRNGKey(0),
            deterministic=True,
        )
        st2, out = step_batch(scene, eval_cfg, st, action)
        first_done = out.done & (~latched["done"])
        new = {"done": latched["done"] | out.done}
        for name, info_key, _ in _LATCH_KEYS:
            new[name] = jnp.where(
                first_done, out.info[info_key], latched[name]
            )
        return (st2, out.metrics, out.render, new), None

    latched0 = {"done": jnp.zeros((n_envs,), bool)}
    for name, _, dt in _LATCH_KEYS:
        latched0[name] = jnp.zeros((n_envs,), dt)
    (_, _, _, latched), _ = jax.lax.scan(
        body, (states, metrics, render, latched0), None, length=max_steps
    )
    return latched
