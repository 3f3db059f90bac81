"""Pseudo-camera RGB: ground-plane projective rendering.

The reference records three 384x216 fov-60 RGB cameras in expert demos
(``carla_env.py:25-48``, ``obs_manager/camera/rgb.py``) — UE4-rendered
frames. The policy never consumes them (``carla_env.py:96-100`` uses the
birdview only; SURVEY §7 step 8 ranks the camera last), but the demo-export
format includes them, so we provide an honest geometric approximation: each
camera pixel below the horizon is ray-cast onto the ground plane and shaded
with the same road/lane/route palette as the BEV; pixels above the horizon
get sky. Cited limitation: no buildings, vehicles or textures — this is a
placeholder sensor, not a neural renderer.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from gail_carla_tpu.ops.bev import (
    LANE_HALF_W, capsule_min_dist2, fetch_cell,
)
from gail_carla_tpu.scene.scene import StaticScene

CAM_W, CAM_H = 384, 216      # carla_env.py:27-28
CAM_FOV = 60.0               # degrees
CAM_HEIGHT = 1.3             # m above ground (carla_env.py:30)
CAM_FORWARD = 0.8            # m ahead of the ego origin

SKY = (135, 180, 235)
GROUND = (90, 85, 80)
ROAD = (46, 52, 54)
LANE_SOLID = (255, 0, 255)
LANE_BROKEN = (255, 140, 255)


def render_camera(
    scene: StaticScene, xy, yaw, cam_yaw_offset: float = 0.0
):
    """(H, W, 3) u8 pseudo-camera frame; ``cam_yaw_offset`` ±55° gives the
    left/right cameras (carla_env.py:33-47)."""
    f = CAM_W / (2.0 * math.tan(math.radians(CAM_FOV) / 2.0))
    u = (jnp.arange(CAM_W, dtype=jnp.float32) - CAM_W / 2.0 + 0.5) / f
    v = (jnp.arange(CAM_H, dtype=jnp.float32) - CAM_H / 2.0 + 0.5) / f
    uu, vv = jnp.meshgrid(u, v)

    below = vv > 1e-4                        # ray hits the ground
    depth = jnp.where(below, CAM_HEIGHT / jnp.maximum(vv, 1e-4), 1e6)
    depth = jnp.clip(depth, 0.0, 120.0)

    cam_yaw = yaw + cam_yaw_offset
    fwd = jnp.stack([jnp.cos(cam_yaw), jnp.sin(cam_yaw)])
    right = jnp.stack([-jnp.sin(cam_yaw), jnp.cos(cam_yaw)])
    base = xy + CAM_FORWARD * jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    pts = (
        base[None, None, :]
        + depth[..., None] * fwd[None, None, :]
        + (depth * uu)[..., None] * right[None, None, :]
    ).reshape(-1, 2)

    road_segs, _, lane_segs, lane_val = fetch_cell(scene, xy)
    on_road = capsule_min_dist2(pts, road_segs) <= scene.half_lane**2

    a = lane_segs[None, :, :2]
    b = lane_segs[None, :, 2:]
    ab = b - a
    ap = pts[:, None, :] - a
    t = jnp.clip(
        jnp.sum(ap * ab, -1) / (jnp.sum(ab * ab, -1) + 1e-9), 0.0, 1.0
    )
    d2 = jnp.sum((ap - t[..., None] * ab) ** 2, -1)
    lane_v = jnp.max(
        jnp.where(d2 <= (LANE_HALF_W * 2) ** 2, lane_val[None, :], 0.0),
        axis=1,
    )

    img = jnp.tile(jnp.asarray(GROUND, jnp.uint8)[None], (pts.shape[0], 1))
    img = jnp.where(
        on_road[:, None], jnp.asarray(ROAD, jnp.uint8)[None], img
    )
    img = jnp.where(
        (lane_v == 120)[:, None], jnp.asarray(LANE_BROKEN, jnp.uint8)[None],
        img,
    )
    img = jnp.where(
        (lane_v == 255)[:, None], jnp.asarray(LANE_SOLID, jnp.uint8)[None],
        img,
    )
    img = img.reshape(CAM_H, CAM_W, 3)
    sky = jnp.asarray(SKY, jnp.uint8)[None, None, :]
    img = jnp.where(below.reshape(CAM_H, CAM_W)[..., None], img, sky)
    return img
