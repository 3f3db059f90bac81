"""Shared input processors for the policy and the discriminator.

Mirrors ``tools/model.py``: ``ProcessObsFeatures`` (ImageNet-normalised
4-conv CNN, model.py:131-164), ``ProcessMetrics`` (scaled target/radius/angle
+ command embedding, model.py:167-213 — minus its device->host numpy round
trip, the perf bug flagged in SURVEY §3.4), and raw action pass-through
(model.py:216-225).

Convs run in the configured compute dtype (bfloat16 by default — MXU native)
with float32 params and outputs.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gail_carla_tpu.config import ModelConfig

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ObsEncoder(nn.Module):
    """4 x (Conv k4 s2 + LeakyReLU 0.2) on the (3, H, W) BEV obs, or a small
    MLP when the observation is a state vector (B, D) — the BEV-free fast
    path of ops/state_obs.py."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, obs):
        if obs.ndim == 2:  # state-vector observation
            x = obs
            for _ in range(2):
                x = nn.Dense(256, dtype=_dtype(self.cfg))(x)
                x = nn.leaky_relu(x, self.cfg.leaky_slope)
            return x.astype(jnp.float32)
        # obs: (B, C, H, W) float32 in [0, 1] (torchvision ToTensor layout);
        # channels beyond the reference's 3 (the bev6 signal/actor masks)
        # are normalised with 0.5/0.25
        c = obs.shape[1]
        x = jnp.transpose(obs, (0, 2, 3, 1))  # NHWC for TPU convs
        mean = jnp.asarray(
            IMAGENET_MEAN + (0.5,) * (c - 3), x.dtype
        )
        std = jnp.asarray(IMAGENET_STD + (0.25,) * (c - 3), x.dtype)
        x = (x - mean) / std
        x = x.astype(_dtype(self.cfg))
        for ch in self.cfg.conv_channels:
            x = nn.Conv(
                ch, (4, 4), strides=(2, 2), padding="VALID",
                dtype=_dtype(self.cfg),
            )(x)
            x = nn.leaky_relu(x, self.cfg.leaky_slope)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


class MetricsEncoder(nn.Module):
    """metrics (B, 4) = [target lat, target lon, speed, command] ->
    [1000x, 1000y, 1000r, 0.3theta, 0.1speed, embed(command)]."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, metrics):
        x = metrics[:, 0]
        y = metrics[:, 1]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(y, x)
        speed = metrics[:, 2]
        feats = jnp.stack(
            [1000.0 * x, 1000.0 * y, 1000.0 * r, 0.3 * theta, 0.1 * speed],
            axis=1,
        )
        cmd = metrics[:, 3].astype(jnp.int32)
        emb = nn.Embed(
            self.cfg.max_road_options, self.cfg.cmd_embed_dim,
            dtype=jnp.float32,
        )(jnp.clip(cmd, 0, self.cfg.max_road_options - 1))
        return jnp.concatenate([feats, emb], axis=1)

    @staticmethod
    def scaled_continuous(metrics):
        """The differentiable part only (used for the grad-penalty input in
        wdgail.py:82-91, where gradients flow to the *scaled* features)."""
        x = metrics[:, 0]
        y = metrics[:, 1]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(y, x)
        return jnp.stack(
            [1000.0 * x, 1000.0 * y, 1000.0 * r, 0.3 * theta,
             0.1 * metrics[:, 2]],
            axis=1,
        )
