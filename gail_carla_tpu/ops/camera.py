"""Pseudo-camera RGB: ground-plane + ray-traced-box projective rendering.

The reference records three 384x216 fov-60 RGB cameras in expert demos
(``carla_env.py:25-48``, ``obs_manager/camera/rgb.py``) — UE4-rendered
frames. The policy never consumes them (``carla_env.py:96-100`` uses the
birdview only; SURVEY §7 step 8 ranks the camera last), but the demo-export
format includes them, so we provide an honest geometric approximation: each
camera pixel below the horizon is ray-cast onto the ground plane and shaded
with the same road/lane/route palette as the BEV; pixels above the horizon
get sky; and the scene's dynamic actors (NPC vehicles, walkers), static
obstacles and traffic-light heads are ray-traced as oriented 3D boxes
(slab method) with a depth test against the ground, using the BEV RGB
palette (``ops/bev_full.py``). Box faces are Lambert-shaded against the
sun direction (so boxes read as 3D, and the shading tracks the dynamic
weather's sun path, ``sim/weather.py::weather_at``), the sky is a
zenith->horizon gradient, and an exponential distance fog driven by the
weather's ``fog_density`` readout fades the far field — the same three
cues UE4's renderer provides. Cited limitation: no textures or meshes —
a geometric sensor, not a neural renderer.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gail_carla_tpu.ops.bev import (
    boundary_inside, fetch_bnd_cell, fetch_cell,
)
from gail_carla_tpu.scene.scene import StaticScene

CAM_W, CAM_H = 384, 216      # carla_env.py:27-28
CAM_FOV = 60.0               # degrees
CAM_HEIGHT = 1.3             # m above ground (carla_env.py:30)
CAM_FORWARD = 0.8            # m ahead of the ego origin

SKY = (135, 180, 235)           # horizon tint (also the fog color)
SKY_ZENITH = (70, 120, 215)     # overhead blue, gradient to SKY at horizon
GROUND = (90, 85, 80)
ROAD = (46, 52, 54)
LANE_SOLID = (255, 0, 255)
LANE_BROKEN = (255, 140, 255)
# actor/structure palette — matches the BEV rendered-RGB colors
# (ops/bev_full.py:192-200) so demo frames are cross-consistent
VEHICLE = (0, 0, 255)
WALKER = (0, 255, 255)
BUILDING = (120, 120, 120)
TL_COLORS = ((0, 255, 0), (255, 255, 0), (255, 0, 0))  # green/yellow/red

# box half-heights (m): vehicle roofline ~1.5, walker ~1.8, building 6
VEH_HH, WALKER_HH, OB_HH = 0.75, 0.9, 3.0
TL_HEAD_Z, TL_HEAD_HE = 2.4, (0.35, 0.35, 0.35)   # light head centre/size
MAX_BOXES = 64               # nearest boxes kept per frame (top_k budget)


def _ray_boxes(o, d, centers, yaws, extents, sun_dir):
    """Slab-method ray vs oriented-box intersection.

    o (3,) ray origin; d (N, 3) unnormalised ray directions; centers (B, 3),
    yaws (B,), extents (B, 3) half sizes; sun_dir (3,) unit vector TOWARD
    the sun. Returns (t, shade): entry parameter t (N, B), 1e9 where the
    ray misses (t is in the same parameterisation as the ground hit
    ``CAM_HEIGHT / v``, so the two depth-test directly), and a Lambert
    factor (N, B) for the hit face (ambient + diffuse * max(0, n.l),
    where n is the entry-slab face normal)."""
    c, s = jnp.cos(yaws), jnp.sin(yaws)
    rel = o[None, :] - centers                       # (B, 3)
    ox = c * rel[:, 0] + s * rel[:, 1]
    oy = -s * rel[:, 0] + c * rel[:, 1]
    oz = rel[:, 2]
    dx = c[None, :] * d[:, 0:1] + s[None, :] * d[:, 1:2]   # (N, B)
    dy = -s[None, :] * d[:, 0:1] + c[None, :] * d[:, 1:2]
    dz = jnp.broadcast_to(d[:, 2:3], dx.shape)

    def slab(oo, dd, h):
        # dd ~ 0: a huge positive inv keeps inside-slab rays inside and
        # pushes outside-slab rays to an empty interval either way
        inv = jnp.where(jnp.abs(dd) < 1e-9, 1e9, 1.0 / dd)
        t1 = (-h[None, :] - oo[None, :]) * inv
        t2 = (h[None, :] - oo[None, :]) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n0, f0 = slab(ox, dx, extents[:, 0])
    n1, f1 = slab(oy, dy, extents[:, 1])
    n2, f2 = slab(oz, dz, extents[:, 2])
    tmin = jnp.maximum(jnp.maximum(n0, n1), n2)
    tmax = jnp.minimum(jnp.minimum(f0, f1), f2)
    hit = (tmax >= tmin) & (tmax > 0.0)

    # entry-face normal . sun, per candidate axis: the face normal is the
    # box axis whose near-slab t equals tmin, pointing against the ray
    # (world box axes: x=(c,s,0), y=(-s,c,0), z=(0,0,1))
    lx = c * sun_dir[0] + s * sun_dir[1]             # sun in box frame (B,)
    ly = -s * sun_dir[0] + c * sun_dir[1]
    lz = jnp.broadcast_to(sun_dir[2], lx.shape)
    nl = jnp.where(
        n0 == tmin, -jnp.sign(dx) * lx[None, :],
        jnp.where(n1 == tmin, -jnp.sign(dy) * ly[None, :],
                  -jnp.sign(dz) * lz[None, :]),
    )
    shade = 0.45 + 0.55 * jnp.maximum(nl, 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), 1e9), shade


def render_camera(
    scene: StaticScene, xy, yaw, cam_yaw_offset: float = 0.0,
    veh_pose=None, walker_pose=None, tl_states=None, brightness=None,
    sun_altitude=None, sun_azimuth=None, fog_density=None,
):
    """(H, W, 3) u8 pseudo-camera frame; ``cam_yaw_offset`` ±55° gives the
    left/right cameras (carla_env.py:33-47).

    Optional actor channels: ``veh_pose`` (K, 3) x/y/yaw NPC vehicles,
    ``walker_pose`` (W, 3), ``tl_states`` (T,) light phases — when given,
    they are ray-traced as 3D boxes over the ground image, along with the
    scene's static obstacles.

    Optional lighting (from ``sim/weather.py::weather_at`` readouts):
    ``sun_altitude``/``sun_azimuth`` in degrees steer the Lambert shading
    of box faces (default: high noon); ``fog_density`` (CARLA's 0-100
    scale) sets the exponential distance-fog visibility; ``brightness``
    (``weather.sun_brightness``) scales the whole frame for day/night."""
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

    # ground points beyond the cell table's reach fall outside the dmax
    # guard and paint as grass — an accepted horizon artifact (cameras are
    # a flat-shaded approximation the policy never consumes,
    # carla_env.py:96-100)
    _, _, lane_segs, lane_val, lane_w = fetch_cell(scene, xy)
    bnd_segs, _ = fetch_bnd_cell(scene, xy)
    on_road = boundary_inside(pts, bnd_segs, scene.bnd_dmax)

    a = lane_segs[None, :, :2]
    b = lane_segs[None, :, 2:]
    ab = b - a
    ap = pts[:, None, :] - a
    t = jnp.clip(
        jnp.sum(ap * ab, -1) / (jnp.sum(ab * ab, -1) + 1e-9), 0.0, 1.0
    )
    d2 = jnp.sum((ap - t[..., None] * ab) ** 2, -1)
    lane_v = jnp.max(
        jnp.where(d2 <= (lane_w[None, :] * 2) ** 2, lane_val[None, :], 0.0),
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
    # sky: zenith->horizon gradient on the ray's upward angle
    vmax = (CAM_H / 2.0) / f
    up = jnp.clip(-vv.reshape(-1) / vmax, 0.0, 1.0)          # 0 horizon, 1 top
    sky_rgb = (
        jnp.asarray(SKY, jnp.float32)[None, :]
        + up[:, None]
        * (jnp.asarray(SKY_ZENITH, jnp.float32)
           - jnp.asarray(SKY, jnp.float32))[None, :]
    ).astype(jnp.uint8)
    img = jnp.where(below.reshape(-1)[:, None], img, sky_rgb)

    # sun direction (unit, toward the sun) for box-face Lambert shading
    alt = math.radians(75.0) if sun_altitude is None else (
        sun_altitude * (math.pi / 180.0)
    )
    az = 0.0 if sun_azimuth is None else sun_azimuth * (math.pi / 180.0)
    sun_dir = jnp.stack([
        jnp.cos(alt) * jnp.cos(az),
        jnp.cos(alt) * jnp.sin(az),
        jnp.sin(alt),
    ]).astype(jnp.float32)

    # --- 3D box pass: NPC vehicles/walkers, static obstacles, light heads
    centers, yaws, extents, colors = [], [], [], []
    if veh_pose is not None and veh_pose.shape[0] > 0:
        K = veh_pose.shape[0]
        centers.append(jnp.concatenate(
            [veh_pose[:, :2], jnp.full((K, 1), VEH_HH)], axis=1))
        yaws.append(veh_pose[:, 2])
        extents.append(jnp.tile(
            jnp.asarray([[2.45, 1.06, VEH_HH]]), (K, 1)))
        colors.append(jnp.tile(
            jnp.asarray([VEHICLE], jnp.uint8), (K, 1)))
    if walker_pose is not None and walker_pose.shape[0] > 0:
        W = walker_pose.shape[0]
        centers.append(jnp.concatenate(
            [walker_pose[:, :2], jnp.full((W, 1), WALKER_HH)], axis=1))
        yaws.append(walker_pose[:, 2])
        extents.append(jnp.tile(
            jnp.asarray([[0.35, 0.35, WALKER_HH]]), (W, 1)))
        colors.append(jnp.tile(
            jnp.asarray([WALKER], jnp.uint8), (W, 1)))
    if scene.ob_n > 0:
        O = scene.ob_pose.shape[0]
        centers.append(jnp.concatenate(
            [scene.ob_pose[:, :2], jnp.full((O, 1), OB_HH)], axis=1))
        yaws.append(scene.ob_pose[:, 2])
        extents.append(jnp.concatenate(
            [scene.ob_extent, jnp.full((O, 1), OB_HH)], axis=1))
        colors.append(jnp.tile(
            jnp.asarray([BUILDING], jnp.uint8), (O, 1)))
    if tl_states is not None and scene.tl_n > 0:
        T = scene.tl_stop.shape[0]
        pole = scene.tl_stop[:, 1]          # stop-line kerb end
        centers.append(jnp.concatenate(
            [pole, jnp.full((T, 1), TL_HEAD_Z)], axis=1))
        yaws.append(scene.tl_yaw)
        extents.append(jnp.tile(
            jnp.asarray([TL_HEAD_HE]), (T, 1)))
        tl_rgb = jnp.asarray(TL_COLORS, jnp.uint8)[
            jnp.clip(tl_states.astype(jnp.int32), 0, 2)
        ]
        colors.append(tl_rgb)

    if centers:
        centers = jnp.concatenate(centers, axis=0)
        yaws_all = jnp.concatenate(yaws, axis=0)
        extents = jnp.concatenate(extents, axis=0)
        colors = jnp.concatenate(colors, axis=0)
        B = centers.shape[0]
        if B > MAX_BOXES:
            # keep the nearest MAX_BOXES boxes (static top_k shape)
            d2c = jnp.linalg.norm(centers[:, :2] - xy[None, :], axis=-1)
            _, keep = jax.lax.top_k(-d2c, MAX_BOXES)
            centers = centers[keep]
            yaws_all = yaws_all[keep]
            extents = extents[keep]
            colors = colors[keep]

        o = jnp.concatenate([base, jnp.asarray([CAM_HEIGHT])])
        fwd3 = jnp.stack([fwd[0], fwd[1], jnp.zeros(())])
        right3 = jnp.stack([right[0], right[1], jnp.zeros(())])
        dirs = (
            fwd3[None, :]
            + uu.reshape(-1)[:, None] * right3[None, :]
            - vv.reshape(-1)[:, None]
            * jnp.asarray([0.0, 0.0, 1.0])[None, :]
        )
        t_box, shade = _ray_boxes(
            o, dirs, centers, yaws_all, extents, sun_dir
        )  # (N, B)
        t_near = jnp.min(t_box, axis=1)
        b_near = jnp.argmin(t_box, axis=1)
        t_ground = jnp.where(below.reshape(-1), depth.reshape(-1), 1e9)
        box_vis = t_near < jnp.minimum(t_ground, 1e8)
        # gather-free color/shade pick (one-hot matmul; see DESIGN.md §2)
        onehot = jax.nn.one_hot(b_near, t_box.shape[1], dtype=jnp.float32)
        box_rgb = onehot @ colors.astype(jnp.float32)
        box_rgb = box_rgb * jnp.sum(onehot * shade, axis=1)[:, None]
        img = jnp.where(
            box_vis[:, None], box_rgb.astype(jnp.uint8), img
        )
        fog_dist = jnp.where(
            box_vis, t_near,
            jnp.where(below.reshape(-1), depth.reshape(-1),
                      120.0 * (1.0 - up)),
        )
    else:
        fog_dist = jnp.where(
            below.reshape(-1), depth.reshape(-1), 120.0 * (1.0 - up)
        )

    if fog_density is not None:
        # exponential distance fog toward the horizon tint; visibility
        # from the weather's fog_density readout (Storm's 0-30 dynamic
        # range / CARLA's 0-100 scale); fog 0 = visibility 1.5 km
        vis = 1500.0 / (1.0 + fog_density)
        fg = 1.0 - jnp.exp(-fog_dist / vis)
        img = (
            img.astype(jnp.float32)
            + fg[:, None]
            * (jnp.asarray(SKY, jnp.float32)[None, :]
               - img.astype(jnp.float32))
        ).astype(jnp.uint8)

    if brightness is not None:
        # weather/sun ambient factor (sim/weather.py::sun_brightness —
        # the UE4 day/night lighting swing, task_vehicle.py:175-181's
        # below-horizon sun): scale the whole frame, u8-safe.
        img = (
            img.astype(jnp.float32) * jnp.clip(brightness, 0.0, 1.0)
        ).astype(jnp.uint8)
    return img.reshape(CAM_H, CAM_W, 3)
