"""WDGAIL critic (``algo/wdgail.py:18-98``): D(obs, metrics, action) through
the same CNN/metrics processors as the policy, then Linear(hidden=100) ->
LeakyReLU(0.2) -> Linear(1).

The mixup gradient penalty matches the reference exactly: gradients are taken
w.r.t. the *image* input only (wdgail.py:85-91 keeps ``grad(...)[0]``, the
state tensor) on alpha-mixed expert/policy triples, penalty
lambda*(||g||_2 - 1)^2 with lambda = 10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gail_carla_tpu.config import ModelConfig
from gail_carla_tpu.models.processors import MetricsEncoder, ObsEncoder


class DiscriminatorNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, obs, metrics, action):
        c = self.cfg
        obs_feat = ObsEncoder(c)(obs)
        met_feat = MetricsEncoder(c)(metrics)
        x = jnp.concatenate([obs_feat, met_feat, action], axis=1)
        x = nn.Dense(c.disc_hidden)(x)
        x = nn.leaky_relu(x, c.leaky_slope)
        return nn.Dense(1)(x)[:, 0]


def init_discriminator(rng, cfg: ModelConfig, obs_shape=(3, 192, 192)):
    net = DiscriminatorNet(cfg)
    params = net.init(
        rng,
        jnp.zeros((1,) + obs_shape, jnp.float32),
        jnp.zeros((1, 4), jnp.float32),
        jnp.zeros((1, 2), jnp.float32),
    )
    return net, params


def predict_reward(net, params, obs, metrics, action):
    """wdgail.py:181-189: r = -log(1 - sigmoid(D)) == softplus(D)."""
    d = net.apply(params, obs, metrics, action)
    return jax.nn.softplus(d)


def grad_penalty(net, params, rng, expert, policy, lambda_: float = 10.0):
    """wdgail.py:56-98. ``expert``/``policy`` are (obs, metrics, action)
    triples; one alpha per sample mixes all three, but only the obs gradient
    is penalised (the reference's grad(...)[0])."""
    e_obs, e_met, e_act = expert
    p_obs, p_met, p_act = policy
    alpha = jax.random.uniform(rng, (e_obs.shape[0], 1, 1, 1))
    mix_obs = alpha * e_obs + (1 - alpha) * p_obs
    a2 = alpha[:, :, 0, 0]
    mix_met = a2 * e_met + (1 - a2) * p_met
    mix_act = a2 * e_act + (1 - a2) * p_act

    def d_sum(obs):
        return jnp.sum(net.apply(params, obs, mix_met, mix_act))

    g = jax.grad(d_sum)(mix_obs)
    g = g.reshape(g.shape[0], -1)
    norm = jnp.linalg.norm(g, axis=1)
    return lambda_ * jnp.mean((norm - 1.0) ** 2)


def wd_loss(net, params, expert, policy):
    """-(E[tanh D_e] - E[tanh D_p]) building block (wdgail.py:124-131).
    Returns (wd, d_expert_mean_raw, d_policy_mean_raw)."""
    d_e = net.apply(params, *expert)
    d_p = net.apply(params, *policy)
    wd = jnp.mean(jnp.tanh(d_e)) - jnp.mean(jnp.tanh(d_p))
    return wd, jnp.mean(d_e), jnp.mean(d_p)
