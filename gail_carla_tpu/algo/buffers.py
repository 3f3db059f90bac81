"""Rollout and expert-demo buffers.

Replaces ``tools/storage.py`` (RolloutStorage) and the PNG-backed
``ExpertDataset`` (``algo/wdgail.py:192-241``). Two observation policies:

- ``obs`` materialised BIT-PACKED to one uint8 per pixel (T, N, W, W):
  render once while acting, decode per minibatch. Every BEV channel is
  discrete (road/route/vehicle/walker binary, lane in {0,120,255},
  signal in {0,80,170,255} — chauffeurnet.py:186-199 encodings), so the
  6-channel image packs losslessly into 8 bits/pixel: 6x less HBM than
  flat u8 planes, which makes stored-obs affordable at 4096 envs
  (17 x 4096 x 192^2 = 2.6 GB vs 15.4 GB).
- ``obs = None``: minibatches re-render from the compact RenderState — the
  rematerialisation fallback for when even packed frames don't fit.

Both live entirely on device; there is no host dataloader. Unpacking
reproduces the renderer's floats BIT-EXACTLY (same ``value * INV_255``
f32 multiply — see the Mosaic reciprocal gotcha in ops/bev.py:39-41).
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


def pack_bev_obs(cfg: EnvConfig, obs) -> jnp.ndarray:
    """(..., C, W, W) float BEV obs -> (..., W, W) uint8, one byte/pixel.

    Bit layout: 0 road, 1 route, 2-3 lane code {0,120,255},
    4-5 signal code {0,80,170,255}, 6 vehicles, 7 walkers (bev6 only).
    Thresholds sit between the discrete levels, so f32 rounding noise in
    ``value * INV_255 * 255`` can't flip a code."""
    road = (obs[..., 0, :, :] > 0.5).astype(jnp.uint8)
    route = (obs[..., 1, :, :] > 0.5).astype(jnp.uint8)
    lane = obs[..., 2, :, :] * 255.0
    lane_c = (lane > 60.0).astype(jnp.uint8) + (lane > 190.0).astype(
        jnp.uint8
    )
    packed = road | (route << 1) | (lane_c << 2)
    if cfg.obs_mode == "bev6":
        sig = obs[..., 3, :, :] * 255.0
        sig_c = (
            (sig > 40.0).astype(jnp.uint8)
            + (sig > 125.0).astype(jnp.uint8)
            + (sig > 212.0).astype(jnp.uint8)
        )
        veh = (obs[..., 4, :, :] > 0.5).astype(jnp.uint8)
        wk = (obs[..., 5, :, :] > 0.5).astype(jnp.uint8)
        packed = packed | (sig_c << 4) | (veh << 6) | (wk << 7)
    return packed


def unpack_bev_obs(cfg: EnvConfig, packed) -> jnp.ndarray:
    """(..., W, W) uint8 -> (..., C, W, W) float32, bit-identical to the
    renderer's output (decode multiplies the level by INV_255 exactly as
    ops/bev.py:250-252 / ops/bev6.py:50-57 do)."""
    from gail_carla_tpu.ops.bev import INV_255

    road = (packed & 1).astype(jnp.float32)
    route = ((packed >> 1) & 1).astype(jnp.float32)
    lane_c = (packed >> 2) & 3
    lane = jnp.where(
        lane_c == 1, 120.0, jnp.where(lane_c == 2, 255.0, 0.0)
    ) * INV_255
    chans = [road, route, lane]
    if cfg.obs_mode == "bev6":
        sig_c = (packed >> 4) & 3
        sig = jnp.where(
            sig_c == 1, 80.0,
            jnp.where(sig_c == 2, 170.0, jnp.where(sig_c == 3, 255.0, 0.0)),
        ) * INV_255
        veh = ((packed >> 6) & 1).astype(jnp.float32)
        wk = ((packed >> 7) & 1).astype(jnp.float32)
        chans += [sig, veh, wk]
    return jnp.stack(chans, axis=-3)


def store_encode(cfg: EnvConfig, obs) -> jnp.ndarray:
    """Encode a float obs batch for in-buffer storage (packed for BEV
    modes, raw float for state vectors)."""
    if cfg.obs_mode == "state":
        return obs
    return pack_bev_obs(cfg, obs)


def _decode(cfg: EnvConfig, obs_stored):
    if obs_stored.dtype == jnp.uint8:
        if obs_stored.ndim == 4:
            # (B, C, W, W) per-channel planes (PNG-loaded expert trees)
            return obs_stored.astype(jnp.float32) / 255.0
        return unpack_bev_obs(cfg, obs_stored)  # (B, W, W) bit-packed
    return obs_stored  # state vectors are stored as float


def fetch_rollout_obs(scene, cfg: EnvConfig, rollout: Rollout, t_idx, n_idx):
    """(B, 3, W, W) float obs for flat minibatch indices (t, n)."""
    if rollout.obs is not None:
        return _decode(cfg, rollout.obs[t_idx, n_idx])
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
        return _decode(cfg, buf.obs[idx])
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

                return pack_bev_obs(
                    cfg, render_bev6_batch_auto(scene, cfg, r)
                )
            return pack_bev_obs(cfg, render_bev_batch_auto(scene, cfg, r))

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
