"""Deterministic policy evaluation (the reference's eval pass,
``tools/learn.py:225-258``, and ``tools/evaluation.py``): run the policy with
deterministic actions on the held-out route and report episode reward /
length / completion."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.algo.rollout import _obs_batch
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.models import policy as policy_mod
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import reset_batch, step_batch


def evaluate_policy(
    scene: StaticScene,
    env_cfg: EnvConfig,
    net,
    params,
    rng,
    route_id: int,
    n_envs: int = 1,
    max_steps: int = 2400,
):
    """Returns dict of (n_envs,) arrays for the FIRST episode finished in
    each env (episodes auto-reset; we latch the first done)."""
    eval_cfg = env_cfg.__class__(
        **{**env_cfg.__dict__, "train": False}
    )
    route_ids = jnp.full((n_envs,), route_id, jnp.int32)
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
        latched = {
            "done": latched["done"] | out.done,
            "reward": jnp.where(
                first_done, out.info["episode_reward"], latched["reward"]
            ),
            "length": jnp.where(
                first_done, out.info["episode_length"], latched["length"]
            ),
            "completed": jnp.where(
                first_done, out.info["route_completed"], latched["completed"]
            ),
        }
        return (st2, out.metrics, out.render, latched), None

    latched0 = {
        "done": jnp.zeros((n_envs,), bool),
        "reward": jnp.zeros((n_envs,)),
        "length": jnp.zeros((n_envs,), jnp.int32),
        "completed": jnp.zeros((n_envs,), bool),
    }
    (_, _, _, latched), _ = jax.lax.scan(
        body, (states, metrics, render, latched0), None, length=max_steps
    )
    return latched
