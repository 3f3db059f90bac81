"""On-device rollout collection: one lax.scan replaces the reference's hot
loop #1 (``tools/learn.py:111-133`` — per-step GPU act, device->host copy,
pipe IPC to workers, CARLA RPC). Here the policy acts and the world steps
inside the same compiled program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gail_carla_tpu.algo import buffers as buffers_mod
from gail_carla_tpu.algo.buffers import Rollout
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.models import policy as policy_mod
from gail_carla_tpu.ops.bev import render_bev_batch_auto
from gail_carla_tpu.ops.state_obs import state_observation_batch
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import step_batch


def _obs_batch(scene, cfg, render_state, metrics):
    """Observation dispatch: BEV images, 6-channel BEV, or state vectors."""
    if cfg.obs_mode == "state":
        return state_observation_batch(scene, cfg, render_state, metrics)
    if cfg.obs_mode == "bev6":
        from gail_carla_tpu.ops.bev6 import render_bev6_batch_auto

        return render_bev6_batch_auto(scene, cfg, render_state)
    return render_bev_batch_auto(scene, cfg, render_state)


def _render_batch(scene, cfg, render_state):
    return render_bev_batch_auto(scene, cfg, render_state)


def collect_rollout(
    scene: StaticScene,
    cfg: EnvConfig,
    net,
    params,
    env_states,
    metrics0,
    render0,
    rng,
    n_steps: int,
    store_obs: bool = True,
) -> Tuple:
    """Returns (env_states', metrics', render', rollout, ep_stats)."""

    def body(carry, k):
        st, metrics, render = carry
        obs = _obs_batch(scene, cfg, render, metrics)
        value, action, logp = policy_mod.act(net, params, obs, metrics, k)
        st2, out = step_batch(scene, cfg, st, action)
        emit = {
            "metrics": metrics,
            "render": render,
            "action": action,
            "logp": logp,
            "value": value,
            "reward": out.reward,
            "mask": 1.0 - out.done.astype(jnp.float32),
            "done": out.done,
            "ep_reward": out.info["episode_reward"],
            "ep_length": out.info["episode_length"],
            "completed": out.info["route_completed"],
        }
        if store_obs:
            # image obs bit-pack to 1 byte/pixel (lossless round-trip —
            # buffers.pack_bev_obs); state vectors stay float
            emit["obs"] = buffers_mod.store_encode(cfg, obs)
        return (st2, out.metrics, out.render), emit

    keys = jax.random.split(rng, n_steps)
    (env_states, metrics_f, render_f), tr = jax.lax.scan(
        body, (env_states, metrics0, render0), keys
    )

    # bootstrap value for the final obs (tools/learn.py:137-139)
    obs_f = _obs_batch(scene, cfg, render_f, metrics_f)
    value_f, _, _ = policy_mod.act(
        net, params, obs_f, metrics_f, jax.random.PRNGKey(0),
        deterministic=True,
    )

    metrics_all = jnp.concatenate([tr["metrics"], metrics_f[None]], axis=0)
    render_all = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0),
        tr["render"], render_f,
    )
    values_all = jnp.concatenate([tr["value"], value_f[None]], axis=0)
    masks_all = jnp.concatenate(
        [jnp.ones_like(tr["mask"][:1]), tr["mask"]], axis=0
    )
    obs_all = None
    if store_obs:
        obs_f_store = buffers_mod.store_encode(cfg, obs_f)
        obs_all = jnp.concatenate([tr["obs"], obs_f_store[None]], axis=0)

    rollout = Rollout(
        render=render_all,
        metrics=metrics_all,
        obs=obs_all,
        actions=tr["action"],
        logp=tr["logp"],
        values=values_all,
        env_rewards=tr["reward"],
        masks=masks_all,
        gail_rewards=jnp.zeros_like(tr["reward"]),
    )

    done = tr["done"]
    n_eps = jnp.maximum(jnp.sum(done), 1)
    ep_stats = {
        "n_episodes": jnp.sum(done),
        "ep_reward_mean": jnp.sum(
            jnp.where(done, tr["ep_reward"], 0.0)
        ) / n_eps,
        "ep_length_mean": jnp.sum(
            jnp.where(done, tr["ep_length"], 0)
        ) / n_eps,
        "completion_rate": jnp.sum(
            jnp.where(done, tr["completed"].astype(jnp.float32), 0.0)
        ) / n_eps,
        "env_reward_mean": jnp.mean(tr["reward"]),
    }
    return env_states, metrics_f, render_f, rollout, ep_stats
