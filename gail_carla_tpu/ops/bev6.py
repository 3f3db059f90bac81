"""6-channel BEV observation — the policy input the reference never had.

Channels: (road, route, lane) exactly as ops/bev.py's mask 0, plus
- signals: stop-line capsules valued by the CURRENT light state
  (80 green / 170 yellow / 255 red, the reference's tl-channel encoding,
  chauffeurnet.py:192-199) + the active un-completed stop sign box at 255;
- vehicles: current-frame NPC boxes;
- walkers: current-frame walker boxes.

Rationale (RESULTS.md): the reference's policy obs (mask 0 only) carries no
signal/actor state, so signal compliance and traffic avoidance are
unobservable — its behaviour ceiling. ``obs_mode="bev6"`` lifts that ceiling
while staying a pure function of RenderState, so the whole rollout-storage /
rematerialisation machinery is unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.ops.bev import render_bev, pixel_world_coords
from gail_carla_tpu.ops.bev import INV_255
from gail_carla_tpu.ops.bev_full import (
    _boxes_mask, capsule_min_dist2_per_seg, TL_LINE_HALF_W, WALKER_HALF,
)
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.dynamics import DEFAULT_VEHICLE


def render_bev6(scene: StaticScene, cfg: EnvConfig, r) -> jnp.ndarray:
    """(6, W, W) float32 in [0, 1] from a RenderState."""
    w = cfg.bev_width
    base = render_bev(scene, cfg, r.xy, r.yaw, r.route_id, r.head)
    px = pixel_world_coords(cfg, r.xy, r.yaw)

    # --- signals channel ---
    sim_time = r.step.astype(jnp.float32) * cfg.dt
    states = signals.light_states(scene, sim_time)
    T = states.shape[0]
    d2 = capsule_min_dist2_per_seg(px, scene.tl_stop.reshape(-1, 4))
    on_line = (d2 <= TL_LINE_HALF_W**2) & (
        jnp.arange(T) < scene.tl_n
    )[None, :]
    val = jnp.where(
        states[None, :] == signals.GREEN, 80,
        jnp.where(states[None, :] == signals.YELLOW, 170, 255),
    )
    sig = jnp.max(jnp.where(on_line, val, 0), axis=1).astype(jnp.float32)

    S = scene.ss_center.shape[0]
    ss_half = jnp.maximum(scene.ss_extent[:, 0], scene.ss_extent[:, 1])
    active = jnp.arange(S) == r.stop_idx
    half = jnp.where(active, ss_half, -1.0)
    stop_mask = _boxes_mask(px, scene.ss_center, scene.ss_yaw, half, half)
    sig = jnp.maximum(sig, jnp.where(stop_mask, 255.0, 0.0)) * INV_255

    # --- actor channels (current frame) ---
    K = r.npc_pose.shape[0]
    Wn = r.walker_pose.shape[0]
    veh = (
        _boxes_mask(
            px, r.npc_pose[:, :2], r.npc_pose[:, 2],
            jnp.full((K,), DEFAULT_VEHICLE.half_length),
            jnp.full((K,), DEFAULT_VEHICLE.half_width),
        ).astype(jnp.float32)
        if K > 0 else jnp.zeros(px.shape[0], jnp.float32)
    )
    wk = (
        _boxes_mask(
            px, r.walker_pose[:, :2], r.walker_pose[:, 2],
            jnp.full((Wn,), WALKER_HALF[0]),
            jnp.full((Wn,), WALKER_HALF[1]),
        ).astype(jnp.float32)
        if Wn > 0 else jnp.zeros(px.shape[0], jnp.float32)
    )

    extra = jnp.stack([sig, veh, wk], axis=0).reshape(3, w, w)
    return jnp.concatenate([base, extra], axis=0)


def render_bev6_batch_auto(scene, cfg, render_state):
    """Backend dispatch like ops/bev.py: Pallas kernel on TPU (2.5x the XLA
    path, exact match), XLA elsewhere."""
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        from gail_carla_tpu.ops.bev6_pallas import render_bev6_pallas_batch

        return render_bev6_pallas_batch(scene, cfg, render_state)
    return render_bev6_batch(scene, cfg, render_state)


def render_bev6_batch(scene, cfg, render_state, chunk: int = 256):
    from gail_carla_tpu.ops.bev import _flatten_lead

    lead = render_state.yaw.shape
    flat = _flatten_lead(render_state, lead)
    n = flat.yaw.shape[0]
    vrender = jax.vmap(lambda rr: render_bev6(scene, cfg, rr))
    if n <= chunk or n % chunk != 0:
        imgs = vrender(flat)
    else:
        chunked = jax.tree.map(
            lambda a: a.reshape((n // chunk, chunk) + a.shape[1:]), flat
        )
        _, imgs = jax.lax.scan(
            lambda _, rr: (None, vrender(rr)), None, chunked
        )
        imgs = imgs.reshape((n,) + imgs.shape[2:])
    return imgs.reshape(lead + imgs.shape[1:])
