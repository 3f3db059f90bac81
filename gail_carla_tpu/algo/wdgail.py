"""WDGAIL discriminator training + reward relabelling, on device.

Port of ``algo/wdgail.py:100-189`` and the warm-up schedule in
``tools/learn.py:144-209``:
- per epoch: zip shuffled expert batches with shuffled policy (rollout)
  batches; loss = -(E[tanh D_e] - E[tanh D_p]) + 10 * grad-penalty on
  alpha-mixup samples (image gradient only); Adam(2.5e-4) with grad clip.
- warm-up: epochs/update decays 6 -> 1 over the first ``gail_thre`` updates.
  Implemented as a fixed-length scan with lax.cond-skipped epochs so one
  compiled program serves every epoch count.
- relabel: gail_reward = softplus(D) (== -log(1 - sigmoid(D))).
- validation WD (pre/post update diagnostics, learn.py:144,178) against a
  held-out expert buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gail_carla_tpu.algo.buffers import (
    ExpertBuffer, Rollout, fetch_expert_obs, fetch_rollout_obs,
)
from gail_carla_tpu.config import EnvConfig, TrainConfig
from gail_carla_tpu.models import discriminator as disc_mod


def make_disc_optimizer(
    tcfg: TrainConfig, mb_per_update: int = 1
) -> optax.GradientTransformation:
    lr = tcfg.gail_lr
    if tcfg.gail_use_linear_lr_decay:
        # Same count->update mapping as the policy schedule
        # (ppo.make_policy_optimizer): warm-up updates run extra epochs
        # and advance the counter faster, slightly front-loading the
        # decay — negligible over hundreds of updates.
        steps = max(mb_per_update, 1)
        n_updates = max(tcfg.n_updates, 1)

        def lr(count):  # noqa: F811
            i_update = count // steps
            frac = 1.0 - i_update.astype(jnp.float32) / n_updates
            return tcfg.gail_lr * jnp.maximum(frac, 0.0)

    return optax.chain(
        optax.clip_by_global_norm(tcfg.gail_max_grad_norm),
        optax.adam(
            lr, b1=tcfg.gail_betas[0], b2=tcfg.gail_betas[1],
            eps=tcfg.gail_eps,
        ),
    )


def warmup_epochs(tcfg: TrainConfig, i_update: int) -> int:
    """tools/learn.py:146-151 (host-side; i_update is 1-based)."""
    e = tcfg.gail_epoch
    if i_update < tcfg.gail_thre:
        e += (
            (tcfg.gail_pre_epoch - tcfg.gail_epoch)
            * (tcfg.gail_thre - (i_update - 1))
            / tcfg.gail_thre
        )
    return int(e)


def disc_update(
    scene,
    env_cfg: EnvConfig,
    tcfg: TrainConfig,
    dnet,
    dparams,
    optimizer,
    dopt_state,
    rollout: Rollout,
    expert: ExpertBuffer,
    rng,
    n_epochs,                    # () i32, traced (warm-up varies it)
    axis_name=None,              # pmean grads across a device mesh axis
):
    def _pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name else x

    T, N = rollout.T, rollout.N
    total = T * N
    mb = tcfg.gail_batch_size
    n_mb = min(expert.size, total) // mb
    max_epochs = max(tcfg.gail_pre_epoch, tcfg.gail_epoch)

    met_f = rollout.metrics[:-1].reshape(-1, 4)
    act_f = rollout.actions.reshape(-1, 2)

    def mb_step(carry, inp):
        p, o = carry
        e_idx, p_idx, k_gp = inp
        e_obs = fetch_expert_obs(scene, env_cfg, expert, e_idx)
        e_met = expert.metrics[e_idx]
        e_act = expert.actions[e_idx]
        t_idx = p_idx // N
        n_idx = p_idx % N
        p_obs = fetch_rollout_obs(scene, env_cfg, rollout, t_idx, n_idx)
        p_met = met_f[p_idx]
        p_act = act_f[p_idx]

        def loss_fn(pp):
            wd, d_e, d_p = disc_mod.wd_loss(
                dnet, pp, (e_obs, e_met, e_act), (p_obs, p_met, p_act)
            )
            gp = disc_mod.grad_penalty(
                dnet, pp, k_gp,
                (e_obs, e_met, e_act), (p_obs, p_met, p_act),
                tcfg.grad_pen_lambda,
            )
            loss = -wd + gp
            aux = {
                "dis_total_loss": loss,
                "dis_loss": wd,
                "dis_gp": gp,
                "policy_reward": d_p,
                "expert_reward": d_e,
                "expert_loss": jnp.tanh(d_e),
                "policy_loss": jnp.tanh(d_p),
            }
            return loss, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(p)
        grads = _pmean(grads)
        updates, o2 = optimizer.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, o2), aux

    def epoch_step(carry, inp):
        state, k, epoch_i = carry[0], inp[0], inp[1]

        def run(st):
            k_e, k_p, k_gp = jax.random.split(k, 3)
            e_idx = jax.random.permutation(k_e, expert.size)[
                : n_mb * mb
            ].reshape(n_mb, mb)
            p_idx = jax.random.permutation(k_p, total)[: n_mb * mb].reshape(
                n_mb, mb
            )
            gp_keys = jax.random.split(k_gp, n_mb)
            st2, auxs = jax.lax.scan(mb_step, st, (e_idx, p_idx, gp_keys))
            return st2, jax.tree.map(jnp.mean, auxs)

        def skip(st):
            zero_aux = {
                k_: jnp.zeros(())
                for k_ in (
                    "dis_total_loss", "dis_loss", "dis_gp", "policy_reward",
                    "expert_reward", "expert_loss", "policy_loss",
                )
            }
            return st, zero_aux

        state2, aux = jax.lax.cond(epoch_i < n_epochs, run, skip, state)
        return (state2,), (aux, (epoch_i < n_epochs).astype(jnp.float32))

    keys = jax.random.split(rng, max_epochs)
    ((dparams, dopt_state),), (auxs, did) = jax.lax.scan(
        epoch_step,
        ((dparams, dopt_state),),
        (keys, jnp.arange(max_epochs)),
    )
    denom = jnp.maximum(jnp.sum(did), 1.0)
    aux_mean = jax.tree.map(lambda a: jnp.sum(a * did) / denom, auxs)
    return dparams, dopt_state, aux_mean


def relabel_rewards(
    scene,
    env_cfg: EnvConfig,
    dnet,
    dparams,
    rollout: Rollout,
    chunk: int = 512,
) -> jnp.ndarray:
    """tools/learn.py:196-209: gail_rewards[t] = predict_reward(obs_t,
    metrics_t, action_t). Chunked scan over the flattened buffer."""
    T, N = rollout.T, rollout.N
    total = T * N
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    idx = jnp.arange(total + pad) % total
    idx = idx.reshape(n_chunks, chunk)
    met_f = rollout.metrics[:-1].reshape(-1, 4)
    act_f = rollout.actions.reshape(-1, 2)

    def body(_, ii):
        obs = fetch_rollout_obs(scene, env_cfg, rollout, ii // N, ii % N)
        r = disc_mod.predict_reward(
            dnet, dparams, obs, met_f[ii], act_f[ii]
        )
        return None, r

    _, rew = jax.lax.scan(body, None, idx)
    return rew.reshape(-1)[:total].reshape(T, N)


def validation_wd(
    scene,
    env_cfg: EnvConfig,
    dnet,
    dparams,
    rollout: Rollout,
    expert_val: ExpertBuffer,
    rng,
    chunk: int = 256,
):
    """discriminator.compute_loss (wdgail.py:149-179): mean tanh-D gap
    between a held-out expert set and policy rollout samples. Returns
    (wd, expert_tanh_mean, policy_tanh_mean)."""
    T, N = rollout.T, rollout.N
    total = T * N
    m = expert_val.size
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    e_idx = (jnp.arange(m + pad) % m).reshape(n_chunks, chunk)
    p_idx = jax.random.randint(rng, (n_chunks, chunk), 0, total)
    met_f = rollout.metrics[:-1].reshape(-1, 4)
    act_f = rollout.actions.reshape(-1, 2)

    def body(_, inp):
        ei, pi = inp
        e_obs = fetch_expert_obs(scene, env_cfg, expert_val, ei)
        d_e = jnp.tanh(
            dnet.apply(dparams, e_obs, expert_val.metrics[ei],
                       expert_val.actions[ei])
        )
        p_obs = fetch_rollout_obs(scene, env_cfg, rollout, pi // N, pi % N)
        d_p = jnp.tanh(dnet.apply(dparams, p_obs, met_f[pi], act_f[pi]))
        return None, (d_e, d_p)

    _, (d_e, d_p) = jax.lax.scan(body, None, (e_idx, p_idx))
    e_mean = jnp.mean(d_e.reshape(-1)[:m])
    p_mean = jnp.mean(d_p.reshape(-1)[:m])
    return e_mean - p_mean, e_mean, p_mean
