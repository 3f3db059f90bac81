"""Actor-critic policy (``tools/model.py:15-128``): CNN ⊕ metrics features ->
3-layer MLP body (512) -> head (256) -> value + (steer, throttle) means with
fixed per-dim log-std, tanh on steer and sigmoid on throttle, diagonal
Normal action distribution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gail_carla_tpu.config import ModelConfig
from gail_carla_tpu.models.processors import MetricsEncoder, ObsEncoder

LOG_2PI = 1.8378770664093453


class PolicyNet(nn.Module):
    cfg: ModelConfig
    n_actions: int = 2

    @nn.compact
    def __call__(self, obs, metrics):
        c = self.cfg
        obs_feat = ObsEncoder(c)(obs)
        met_feat = MetricsEncoder(c)(metrics)
        x = jnp.concatenate([obs_feat, met_feat], axis=1)
        # NNBody (model.py:89-105)
        for _ in range(3):
            x = nn.Dense(c.hidden_size)(x)
            x = nn.leaky_relu(x, c.leaky_slope)
        # NNHead (model.py:108-128): value folded into the same head output
        x = nn.Dense(c.head_size)(x)
        x = nn.leaky_relu(x, c.leaky_slope)
        out = nn.Dense(1 + self.n_actions)(x)
        value = out[:, 0]
        mean = out[:, 1:]
        if c.use_activation:  # model.py:80-82
            mean = jnp.stack(
                [jnp.tanh(mean[:, 0]), jax.nn.sigmoid(mean[:, 1])], axis=1
            )
        logstd = jnp.broadcast_to(
            jnp.asarray(c.logstd, jnp.float32), mean.shape
        )
        return value, mean, logstd


def init_policy(rng, cfg: ModelConfig, obs_shape=(3, 192, 192)):
    net = PolicyNet(cfg)
    params = net.init(
        rng,
        jnp.zeros((1,) + obs_shape, jnp.float32),
        jnp.zeros((1, 4), jnp.float32),
    )
    return net, params


def normal_logprob(action, mean, logstd):
    """Sum of per-dim Normal log-probs (model.py:34 ``log_prob(...).sum``)."""
    var = jnp.exp(2.0 * logstd)
    lp = -0.5 * ((action - mean) ** 2 / var + 2.0 * logstd + LOG_2PI)
    return jnp.sum(lp, axis=-1)


def normal_entropy(logstd):
    return jnp.sum(0.5 + 0.5 * LOG_2PI + logstd, axis=-1)


def act(net, params, obs, metrics, rng, deterministic: bool = False):
    """Policy.act (model.py:25-36): sample, return (value, action, logp)."""
    value, mean, logstd = net.apply(params, obs, metrics)
    noise = jax.random.normal(rng, mean.shape)
    action = jnp.where(deterministic, mean, mean + jnp.exp(logstd) * noise)
    logp = normal_logprob(action, mean, logstd)
    return value, action, logp


def evaluate_actions(net, params, obs, metrics, actions):
    """Policy.evaluate_actions (model.py:45-53)."""
    value, mean, logstd = net.apply(params, obs, metrics)
    logp = normal_logprob(actions, mean, logstd)
    entropy = normal_entropy(logstd)
    return value, logp, entropy
