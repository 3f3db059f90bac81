"""On-device bird's-eye-view rendering.

Replaces the reference's CPU rasterizer ``carla_gym/core/obs_manager/
birdview/chauffeurnet.py`` for the channels the policy actually consumes:
``carla_env.py:133-138`` feeds only birdview mask 0 = (road, route, lane) to
the network, so that's the hot path rendered here. (The full 15-channel
history stack for parity/demo export lives in ``ops/bev_full.py``.)

Design: instead of warping the big town texture per step (cv2.warpAffine in
the reference), each output pixel computes its world position from the ego
pose (the exact inverse of chauffeurnet's 3-point affine,
``chauffeurnet.py:274-289``) and gathers the static textures. The "route
ahead" channel — reference draws the next 80 route points each step
(``chauffeurnet.py:148-153``) — becomes a compare against the pre-baked
route arc-length texture (see scene/raster.py): visible iff
s_pixel ∈ [s_now - back_m, s_now + ahead_m].

Everything is a pure function of RenderState, so rollouts can store 6 floats
per step and re-render observations inside PPO/discriminator minibatches —
the rematerialisation trade that keeps 7k-step rollouts on-chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.raster import ROUTE_S_SCALE
from gail_carla_tpu.scene.scene import StaticScene


def _pixel_world_coords(cfg: EnvConfig, xy, yaw, world_offset, ppm):
    """(W, W, 2) texture-pixel coordinates of each BEV output pixel.

    Inverse of chauffeurnet._get_warp_transform: image row 0 is
    (bev_width - pixels_ev_to_bottom) px ahead of the ego, columns span
    ego-right, scaled by bev_width/(bev_width-1) like the exact affine fit.
    """
    w = cfg.bev_width
    ev_px = (xy - world_offset) * ppm
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    fwd = jnp.stack([c, s])
    right = jnp.stack([-s, c])
    top_left = (
        ev_px + (w - cfg.pixels_ev_to_bottom) * fwd - 0.5 * w * right
    )
    scale = w / (w - 1.0)
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(w, dtype=jnp.float32)
    px = (
        top_left[None, None, :]
        + cols[None, :, None] * scale * right[None, None, :]
        - rows[:, None, None] * scale * fwd[None, None, :]
    )
    return px


def render_bev(
    scene: StaticScene,
    cfg: EnvConfig,
    xy: jnp.ndarray,
    yaw: jnp.ndarray,
    route_id: jnp.ndarray,
    s_now: jnp.ndarray,
    back_m: float = 2.0,
) -> jnp.ndarray:
    """(3, W, W) float32 in [0, 1]: channels (road, route, lane) — the
    policy observation (mask 0 of the reference, loaded from PNG as RGB and
    ToTensor'd in carla_env.py:102-138 / wdgail.py:221-236)."""
    px = _pixel_world_coords(
        cfg, xy, yaw, scene.world_offset, scene.ppm
    )
    H, W = scene.road_tex.shape
    ix = jnp.round(px[..., 0]).astype(jnp.int32)
    iy = jnp.round(px[..., 1]).astype(jnp.int32)
    inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)

    road = scene.road_tex[iyc, ixc]
    lane = scene.lane_tex[iyc, ixc]
    sval = scene.route_s_tex[route_id, iyc, ixc]

    s_m = (sval.astype(jnp.float32) - 1.0) * ROUTE_S_SCALE
    route = (
        (sval > 0)
        & (s_m >= s_now - back_m)
        & (s_m <= s_now + cfg.route_ahead_m)
    )

    road_f = jnp.where(inb, road, 0).astype(jnp.float32) / 255.0
    lane_f = jnp.where(inb, lane, 0).astype(jnp.float32) / 255.0
    route_f = jnp.where(inb & route, 1.0, 0.0)
    return jnp.stack([road_f, route_f, lane_f], axis=0)


def render_bev_batch(scene, cfg, render_state):
    """vmap over a RenderState batch (any leading shape)."""
    flat = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[render_state.yaw.ndim:]),
        render_state,
    )
    imgs = jax.vmap(
        lambda r: render_bev(scene, cfg, r.xy, r.yaw, r.route_id, r.s_now)
    )(flat)
    lead = render_state.yaw.shape
    return imgs.reshape(lead + imgs.shape[1:])
