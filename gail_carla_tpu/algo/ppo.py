"""Functional PPO with clipped surrogate + clipped value loss + optional BC
blend ("BCGAIL").

Port of ``algo/ppo.py:45-141``: advantages normalised over the whole buffer,
``ppo_epoch`` epochs of shuffled minibatches, action loss blended with a BC
term weighted by a decaying ``gamma`` (one fresh random expert batch per
policy minibatch — the reference draws the first batch of a reshuffled
DataLoader each time, ppo.py:88-102). Entropy is logged but NOT part of the
loss, matching the reference. All epochs/minibatches run in one lax.scan.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from gail_carla_tpu.algo.buffers import (
    ExpertBuffer, Rollout, fetch_expert_obs, fetch_rollout_obs,
)
from gail_carla_tpu.config import EnvConfig, TrainConfig
from gail_carla_tpu.models import policy as policy_mod


def make_policy_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    lr = tcfg.lr
    if tcfg.use_linear_lr_decay:
        # utli.update_linear_schedule (tools/utli.py:121-125): lr falls
        # linearly per *update*; optimizer steps happen ppo_epoch *
        # minibatch times per update, so map the step count back.
        mb_per_update = max(
            tcfg.ppo_epoch * (tcfg.steps_per_env * tcfg.n_envs
                              // tcfg.mini_batch_size), 1
        )
        n_updates = max(tcfg.n_updates, 1)

        def lr(count):  # noqa: F811
            i_update = count // mb_per_update
            frac = 1.0 - i_update.astype(jnp.float32) / n_updates
            return tcfg.lr * jnp.maximum(frac, 0.0)

    return optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adam(
            lr, b1=tcfg.betas[0], b2=tcfg.betas[1], eps=tcfg.eps
        ),
    )


def ppo_update(
    scene,
    env_cfg: EnvConfig,
    tcfg: TrainConfig,
    net,
    params,
    optimizer,
    opt_state,
    rollout: Rollout,
    returns: jnp.ndarray,        # (T, N)
    rng,
    gail_gamma,                  # () f32 BC weight (decays outside)
    expert: Optional[ExpertBuffer] = None,
    axis_name: Optional[str] = None,
):
    """When ``axis_name`` is set (shard_map data parallelism over envs),
    gradients and advantage statistics are pmean'd across devices so every
    replica applies the identical update — the psum-gradient pattern from
    SURVEY §2.2's TPU-equivalents list."""
    T, N = rollout.T, rollout.N
    total = T * N
    mb = tcfg.mini_batch_size
    n_mb = total // mb

    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    values = rollout.values[:-1]
    adv = returns - values
    adv_mean = _pmean(jnp.mean(adv))
    adv_sq = _pmean(jnp.mean((adv - adv_mean) ** 2))
    adv = (adv - adv_mean) / (jnp.sqrt(adv_sq) + 1e-5)

    adv_f = adv.reshape(-1)
    ret_f = returns.reshape(-1)
    val_f = values.reshape(-1)
    logp_f = rollout.logp.reshape(-1)
    act_f = rollout.actions.reshape(-1, 2)
    met_f = rollout.metrics[:-1].reshape(-1, 4)

    def mb_step(carry, inp):
        p, o = carry
        idx, k_exp = inp
        t_idx = idx // N
        n_idx = idx % N
        obs = fetch_rollout_obs(scene, env_cfg, rollout, t_idx, n_idx)
        metrics = met_f[idx]
        actions = act_f[idx]
        old_logp = logp_f[idx]
        old_v = val_f[idx]
        ret = ret_f[idx]
        advt = adv_f[idx]

        if expert is not None:
            e_idx = jax.random.randint(k_exp, (mb,), 0, expert.size)
            e_obs = fetch_expert_obs(scene, env_cfg, expert, e_idx)
            e_met = expert.metrics[e_idx]
            e_act = expert.actions[e_idx]

        def loss_fn(pp):
            value, logp, entropy = policy_mod.evaluate_actions(
                net, pp, obs, metrics, actions
            )
            ratio = jnp.exp(logp - old_logp)
            surr1 = ratio * advt
            surr2 = jnp.clip(
                ratio, 1.0 - tcfg.clip_param, 1.0 + tcfg.clip_param
            ) * advt
            action_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            gail_action_loss = action_loss

            bc_loss = jnp.zeros(())
            if expert is not None:
                _, e_logp, _ = policy_mod.evaluate_actions(
                    net, pp, e_obs, e_met, e_act
                )
                bc_loss = -jnp.mean(e_logp)
                action_loss = (
                    gail_gamma * bc_loss + (1.0 - gail_gamma) * action_loss
                )

            v_clip = old_v + jnp.clip(
                value - old_v, -tcfg.clip_param, tcfg.clip_param
            )
            v_losses = (value - ret) ** 2
            v_losses_clip = (v_clip - ret) ** 2
            value_loss = 0.5 * jnp.mean(
                jnp.maximum(v_losses, v_losses_clip)
            )

            total_loss = value_loss * tcfg.value_loss_coef + action_loss
            aux = {
                "value_loss": value_loss,
                "action_loss": action_loss,
                "gail_action_loss": gail_action_loss,
                "bc_loss": bc_loss,
                "dist_entropy": jnp.mean(entropy),
            }
            return total_loss, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(p)
        grads = _pmean(grads)
        updates, o2 = optimizer.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, o2), aux

    k_perm, k_exp = jax.random.split(rng)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, total)[: n_mb * mb]
    )(jax.random.split(k_perm, tcfg.ppo_epoch))
    idx_all = perms.reshape(tcfg.ppo_epoch * n_mb, mb)
    keys = jax.random.split(k_exp, tcfg.ppo_epoch * n_mb)

    (params, opt_state), auxs = jax.lax.scan(
        mb_step, (params, opt_state), (idx_all, keys)
    )
    aux_mean = jax.tree.map(jnp.mean, auxs)
    return params, opt_state, aux_mean
