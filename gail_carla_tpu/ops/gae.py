"""Generalised Advantage Estimation as a reverse lax.scan.

Port of ``tools/storage.py:37-50``: the TD targets mix GAIL and env rewards
with gail_coef = 1.0, env_coef = 0.0 (GAIL reward only), masks zero the
bootstrap across episode boundaries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_returns(
    gail_rewards: jnp.ndarray,   # (T, N)
    env_rewards: jnp.ndarray,    # (T, N)
    values: jnp.ndarray,         # (T+1, N) — values[T] is the bootstrap
    masks: jnp.ndarray,          # (T+1, N) — masks[t+1] = 0 where step t ended
    gamma: float,
    gae_lambda: float,
    gail_coef: float = 1.0,
    env_coef: float = 0.0,
) -> jnp.ndarray:
    """Returns (T, N) GAE returns (advantage + value)."""
    rewards = gail_coef * gail_rewards + env_coef * env_rewards

    def body(gae, inp):
        r, v, v_next, m_next = inp
        delta = r + gamma * v_next * m_next - v
        gae = delta + gamma * gae_lambda * m_next * gae
        return gae, gae + v

    _, returns = jax.lax.scan(
        body,
        jnp.zeros_like(rewards[0]),
        (rewards, values[:-1], values[1:], masks[1:]),
        reverse=True,
    )
    return returns
