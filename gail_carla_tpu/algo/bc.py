"""Behaviour cloning — port of ``learn_bc.py:15-72``.

Maximises expert-action log-probability with Adam(3e-4) over shuffled
minibatches, evaluates on a held-out split each epoch, and keeps the best
parameters (the reference saves ``carla_actor_bc.pt`` at each improvement,
learn_bc.py:70-72). Runs as one jitted epoch per call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gail_carla_tpu.algo.buffers import ExpertBuffer, fetch_expert_obs
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.models import policy as policy_mod

BC_LR = 3e-4  # learn_bc.py:27 (Adam default betas)


def make_bc_optimizer(lr: float = BC_LR, max_grad_norm: float = 1.0):
    """Adam with global-norm clipping. The reference's BC runs unclipped
    (learn_bc.py:27), but with the policy's small fixed action std the
    NLL gradient scales like (a-mu)/std^2 — measured: an unclipped run
    diverged between epochs 19-29 into a dead network (train loss
    12.9 -> 65.7, eval pinned at exactly 62.5750 thereafter;
    docs/results/logs/r3b_bc_s0.log). Clipping at 1.0 (the same bound
    PPO uses, tools/learn.py max_grad_norm) removes the blow-up without
    changing the objective."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
    )


def bc_epoch(
    scene,
    env_cfg: EnvConfig,
    net,
    params,
    optimizer,
    opt_state,
    expert: ExpertBuffer,
    rng,
    batch_size: int = 32,
):
    """One training epoch over the expert buffer; returns (params',
    opt_state', mean train loss)."""
    n_mb = expert.size // batch_size

    def mb(carry, idx):
        p, o = carry
        obs = fetch_expert_obs(scene, env_cfg, expert, idx)
        met = expert.metrics[idx]
        act = expert.actions[idx]

        def loss_fn(pp):
            _, logp, _ = policy_mod.evaluate_actions(net, pp, obs, met, act)
            return -jnp.mean(logp)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o2 = optimizer.update(grads, o, p)
        return (optax.apply_updates(p, updates), o2), loss

    perm = jax.random.permutation(rng, expert.size)[: n_mb * batch_size]
    idx = perm.reshape(n_mb, batch_size)
    (params, opt_state), losses = jax.lax.scan(mb, (params, opt_state), idx)
    return params, opt_state, jnp.mean(losses)


def bc_eval(scene, env_cfg, net, params, expert: ExpertBuffer,
            batch_size: int = 256):
    """Mean negative log-prob on a (held-out) buffer (learn_bc.py:44-63)."""
    n_mb = max(expert.size // batch_size, 1)
    idx = jnp.arange(n_mb * batch_size).reshape(n_mb, batch_size) % (
        expert.size
    )

    def mb(_, ii):
        obs = fetch_expert_obs(scene, env_cfg, expert, ii)
        _, logp, _ = policy_mod.evaluate_actions(
            net, params, obs, expert.metrics[ii], expert.actions[ii]
        )
        return None, -jnp.mean(logp)

    _, losses = jax.lax.scan(mb, None, idx)
    return jnp.mean(losses)


def learn_bc(
    scene,
    env_cfg: EnvConfig,
    net,
    params,
    expert_train: ExpertBuffer,
    expert_eval: ExpertBuffer,
    rng,
    epochs: int = 300,           # learn_bc.py:28
    batch_size: int = 32,
    log_fn=None,
):
    """Full BC run; returns (best_params, best_eval_loss)."""
    optimizer = make_bc_optimizer()
    opt_state = optimizer.init(params)
    # expert buffers ride as jit ARGUMENTS: closed-over they become HLO
    # constants, and the remote compiler rejects large constant payloads
    epoch_fn = jax.jit(
        lambda p, o, buf, k: bc_epoch(
            scene, env_cfg, net, p, optimizer, o, buf, k, batch_size,
        )
    )
    eval_fn = jax.jit(
        lambda p, buf: bc_eval(scene, env_cfg, net, p, buf)
    )
    best = (params, float("inf"))
    for e in range(epochs):
        rng, k = jax.random.split(rng)
        params, opt_state, train_loss = epoch_fn(
            params, opt_state, expert_train, k
        )
        eval_loss = float(eval_fn(params, expert_eval))
        if eval_loss < best[1]:
            best = (params, eval_loss)
        if log_fn:
            log_fn(e, float(train_loss), eval_loss)
    return best
