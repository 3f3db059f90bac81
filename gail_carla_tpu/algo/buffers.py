"""Rollout and expert-demo buffers.

Replaces ``tools/storage.py`` (RolloutStorage) and the PNG-backed
``ExpertDataset`` (``algo/wdgail.py:192-241``). Two observation policies:

- ``obs`` materialised as uint8 (T, N, 3, W, W): render once while acting,
  decode per minibatch. Right at reference scale (7200 steps ≈ 0.8 GB HBM).
- ``obs = None``: minibatches re-render from the compact RenderState — the
  rematerialisation mode for huge env counts.

Both live entirely on device; there is no host dataloader.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.ops.bev import render_bev, render_bev_batch_auto
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import RenderState


@struct.dataclass
class Rollout:
    """(T, N, ...) on-policy buffer; index [T] rows of metrics/render/values
    hold the bootstrap step (tools/storage.py keeps T+1 rows the same way)."""

    render: RenderState          # leaves (T+1, N, ...)
    metrics: jnp.ndarray         # (T+1, N, 4)
    obs: Optional[jnp.ndarray]   # (T+1, N, 3, W, W) u8 or None
    actions: jnp.ndarray         # (T, N, 2)
    logp: jnp.ndarray            # (T, N)
    values: jnp.ndarray          # (T+1, N)
    env_rewards: jnp.ndarray     # (T, N)
    masks: jnp.ndarray           # (T+1, N); masks[t+1] = 0 if step t ended
    gail_rewards: jnp.ndarray    # (T, N), filled by the relabel pass

    @property
    def T(self):
        return self.actions.shape[0]

    @property
    def N(self):
        return self.actions.shape[1]


@struct.dataclass
class ExpertBuffer:
    """Flat (M, ...) expert transitions (compacted to valid steps)."""

    render: RenderState          # leaves (M, ...)
    metrics: jnp.ndarray         # (M, 4)
    obs: Optional[jnp.ndarray]   # (M, 3, W, W) u8 or None
    actions: jnp.ndarray         # (M, 2)

    @property
    def size(self):
        return self.actions.shape[0]


def _decode(obs_stored):
    if obs_stored.dtype == jnp.uint8:
        return obs_stored.astype(jnp.float32) / 255.0
    return obs_stored  # state vectors are stored as float


def fetch_rollout_obs(scene, cfg: EnvConfig, rollout: Rollout, t_idx, n_idx):
    """(B, 3, W, W) float obs for flat minibatch indices (t, n)."""
    if rollout.obs is not None:
        return _decode(rollout.obs[t_idx, n_idx])
    r = jax.tree.map(lambda a: a[t_idx, n_idx], rollout.render)
    if cfg.obs_mode == "state":
        from gail_carla_tpu.ops.state_obs import state_observation_batch

        m = rollout.metrics[t_idx, n_idx]
        return state_observation_batch(scene, cfg, r, m)
    if cfg.obs_mode == "bev6":
        from gail_carla_tpu.ops.bev6 import render_bev6_batch_auto

        return render_bev6_batch_auto(scene, cfg, r)
    return render_bev_batch_auto(scene, cfg, r)


def fetch_expert_obs(scene, cfg: EnvConfig, buf: ExpertBuffer, idx):
    if buf.obs is not None:
        return _decode(buf.obs[idx])
    r = jax.tree.map(lambda a: a[idx], buf.render)
    if cfg.obs_mode == "state":
        from gail_carla_tpu.ops.state_obs import state_observation_batch

        return state_observation_batch(scene, cfg, r, buf.metrics[idx])
    if cfg.obs_mode == "bev6":
        from gail_carla_tpu.ops.bev6 import render_bev6_batch_auto

        return render_bev6_batch_auto(scene, cfg, r)
    return render_bev_batch_auto(scene, cfg, r)


def build_expert_buffer(
    scene: StaticScene,
    cfg: EnvConfig,
    demos,                      # algo.expert.DemoBatch
    materialize_obs: bool = True,
    size: Optional[int] = None,
    max_size: Optional[int] = None,
) -> ExpertBuffer:
    """Compact a DemoBatch to its valid steps (host-side, once at startup —
    like the reference loads gail_experts/ once in wdail_carla.py:159-183).
    Pads by repeating valid rows so the result has a static size."""
    render, metrics, actions, valid = demos.flatten()
    valid = np.asarray(valid)
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        raise ValueError("expert generated no valid (completed) episodes")
    if size is None:
        size = len(idx)
    if max_size is not None:
        size = min(size, max_size)
    sel = idx[np.arange(size) % len(idx)]
    sel = jnp.asarray(sel)

    render_sel = jax.tree.map(lambda a: a[sel], render)
    metrics_sel = metrics[sel]
    actions_sel = actions[sel]

    obs = None
    if materialize_obs:
        def chunk_render(r, m):
            if cfg.obs_mode == "state":
                from gail_carla_tpu.ops.state_obs import (
                    state_observation_batch,
                )

                return state_observation_batch(scene, cfg, r, m)
            if cfg.obs_mode == "bev6":
                from gail_carla_tpu.ops.bev6 import render_bev6_batch_auto

                return (
                    render_bev6_batch_auto(scene, cfg, r) * 255.0
                ).astype(jnp.uint8)
            return (
                render_bev_batch_auto(scene, cfg, r) * 255.0
            ).astype(jnp.uint8)

        # assemble on host: a device-side concat would transiently double
        # the buffer (GBs at scale) and can exhaust HBM
        chunks = []
        B = 512
        render_fn = jax.jit(chunk_render)
        for lo in range(0, size, B):
            r = jax.tree.map(lambda a: a[lo:lo + B], render_sel)
            chunks.append(np.asarray(render_fn(r, metrics_sel[lo:lo + B])))
        obs = jnp.asarray(np.concatenate(chunks, axis=0))

    return ExpertBuffer(
        render=render_sel, metrics=metrics_sel, obs=obs, actions=actions_sel
    )
