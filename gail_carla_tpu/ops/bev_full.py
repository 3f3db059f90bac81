"""Full-parity BEV: the 15-channel mask stack + rendered RGB composite.

Port of the non-hot-path outputs of ``chauffeurnet.py:105-211``:
masks = (road, route, lane, 4x vehicle-history, 4x walker-history,
4x light/stop-history) with history taps at ticks [-16, -11, -6, -1]
(carla_env.py:54), and the colour-composed 'rendered' image used for demo
PNGs. Channel values match the reference exactly: lane 255/120
(chauffeurnet.py:186-189), traffic lights 80/170/255 + stop boxes 255
(chauffeurnet.py:192-199), actor masks 255.

Rasterization is the same gather-free geometry as ops/bev.py: point-in-OBB
for actor boxes, capsules for stop lines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.ops.bev import (
    boundary_inside, capsule_min_dist2, fetch_bnd_cell, fetch_cell,
    pixel_world_coords, route_window_segs, ROUTE_HALF_W,
)
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.dynamics import VehicleParams, DEFAULT_VEHICLE
from gail_carla_tpu.sim.state import HistoryState

WALKER_HALF = (0.8, 0.8)  # chauffeurnet.py:266-269 min bbox after scaling
TL_LINE_HALF_W = 0.6      # 6 px stroke at 5 px/m (chauffeurnet.py:237)


def _boxes_mask(px, centers, yaws, half_len, half_wid):
    """(P,) any-point-in-OBB over a box set (chauffeurnet's
    _get_mask_from_actor_list, cv2.fillConvexPoly equivalent)."""
    if centers.shape[0] == 0:
        return jnp.zeros(px.shape[0], bool)
    c = jnp.cos(yaws)[None, :]
    s = jnp.sin(yaws)[None, :]
    dx = px[:, None, 0] - centers[None, :, 0]
    dy = px[:, None, 1] - centers[None, :, 1]
    lx = dx * c + dy * s
    ly = -dx * s + dy * c
    inside = (jnp.abs(lx) <= half_len[None, :]) & (
        jnp.abs(ly) <= half_wid[None, :]
    )
    return jnp.any(inside, axis=1)


def _history_slot(hist: HistoryState, tap: int):
    """Ring lookup of history index ``tap`` (negative, like deque[idx]);
    clamps to the oldest valid entry (chauffeurnet.py:216-217)."""
    tap_clamped = jnp.maximum(jnp.asarray(tap), -jnp.maximum(hist.count, 1))
    slot = jnp.mod(hist.idx + tap_clamped, 20)
    return slot


def push_history(
    hist: HistoryState, veh_pose, walker_pose, tl_state, stop_active
) -> HistoryState:
    i = hist.idx
    return HistoryState(
        veh_pose=jax.lax.dynamic_update_slice(
            hist.veh_pose, veh_pose[None], (i, 0, 0)
        ),
        walker_pose=jax.lax.dynamic_update_slice(
            hist.walker_pose, walker_pose[None], (i, 0, 0)
        ),
        tl_state=jax.lax.dynamic_update_slice(
            hist.tl_state, tl_state[None].astype(jnp.int8), (i, 0)
        ),
        stop_active=jax.lax.dynamic_update_slice(
            hist.stop_active, stop_active[None], (i, 0)
        ),
        idx=(hist.idx + 1) % 20,
        count=jnp.minimum(hist.count + 1, 20),
    )


def render_bev_full(
    scene: StaticScene,
    cfg: EnvConfig,
    xy,
    yaw,
    route_id,
    head,
    hist: HistoryState,
    params: VehicleParams = DEFAULT_VEHICLE,
):
    """Returns (masks (15, W, W) u8, rendered (W, W, 3) u8, collision_px).

    collision_px mirrors chauffeurnet.py:209: the 1.1-scaled ego box
    overlapping the latest walker mask."""
    w = cfg.bev_width
    px = pixel_world_coords(cfg, xy, yaw)
    _, _, lane_segs, lane_val, lane_w = fetch_cell(scene, xy)
    bnd_segs, _ = fetch_bnd_cell(scene, xy)
    route_segs = route_window_segs(scene, route_id, head)

    road = boundary_inside(px, bnd_segs, scene.bnd_dmax)
    route = capsule_min_dist2(px, route_segs) <= ROUTE_HALF_W**2

    d2 = capsule_min_dist2_per_seg(px, lane_segs)
    lane_u8 = jnp.max(
        jnp.where(d2 <= lane_w[None, :] ** 2, lane_val[None, :], 0.0),
        axis=1,
    ).astype(jnp.uint8)

    K = hist.veh_pose.shape[1]
    W_ = hist.walker_pose.shape[1]
    T = hist.tl_state.shape[1]
    S = hist.stop_active.shape[1]

    veh_hl = jnp.full((K,), params.half_length)
    veh_hw = jnp.full((K,), params.half_width)
    wk_hl = jnp.full((W_,), WALKER_HALF[0])
    wk_hw = jnp.full((W_,), WALKER_HALF[1])
    ss_half = jnp.maximum(scene.ss_extent[:, 0], scene.ss_extent[:, 1])

    veh_ch, wk_ch, tl_ch = [], [], []
    wk_mask_last = None
    for tap in cfg.history_idx:  # (-16, -11, -6, -1)
        slot = _history_slot(hist, tap)

        def slot_of(arr):
            if arr.shape[1] == 0:
                return arr[0]
            start = (slot,) + (0,) * (arr.ndim - 1)
            return jax.lax.dynamic_slice(
                arr, start, (1,) + arr.shape[1:]
            )[0]

        vp = slot_of(hist.veh_pose)
        wp = slot_of(hist.walker_pose)
        ts = slot_of(hist.tl_state)
        sa = slot_of(hist.stop_active)

        vm = _boxes_mask(px, vp[:, :2], vp[:, 2], veh_hl, veh_hw)
        wm = _boxes_mask(px, wp[:, :2], wp[:, 2], wk_hl, wk_hw)
        veh_ch.append(vm)
        wk_ch.append(wm)
        wk_mask_last = wm

        # traffic lights: stop-line capsules valued by state + stop boxes
        seg_d2 = capsule_min_dist2_per_seg(px, scene.tl_stop.reshape(-1, 4))
        on_line = seg_d2 <= TL_LINE_HALF_W**2          # (P, T)
        valid_tl = (jnp.arange(T) < scene.tl_n)[None, :]
        val = jnp.where(
            ts[None, :] == 0, 80,
            jnp.where(ts[None, :] == 1, 170, 255),
        )
        tl_u8 = jnp.max(
            jnp.where(on_line & valid_tl, val, 0), axis=1
        )
        stop_on = _boxes_mask(
            px, scene.ss_center, scene.ss_yaw, ss_half, ss_half
        ) if S > 0 else jnp.zeros(px.shape[0], bool)
        stop_any = jnp.any(sa) if S > 0 else jnp.zeros((), bool)
        # only the active target stop sign is drawn (chauffeurnet _get_stops)
        stop_px = _boxes_mask(
            px,
            scene.ss_center,
            scene.ss_yaw,
            jnp.where(sa, ss_half, -1.0),
            jnp.where(sa, ss_half, -1.0),
        ) if S > 0 else jnp.zeros(px.shape[0], bool)
        del stop_on, stop_any
        tl_u8 = jnp.maximum(tl_u8, jnp.where(stop_px, 255, 0))
        tl_ch.append(tl_u8.astype(jnp.uint8))

    to8 = lambda m: (m.astype(jnp.uint8) * 255)  # noqa: E731
    masks = jnp.stack(
        [to8(road), to8(route), lane_u8]
        + [to8(m) for m in veh_ch]
        + [to8(m) for m in wk_ch]
        + list(tl_ch),
        axis=0,
    ).reshape(15, w, w)

    # rendered RGB (chauffeurnet.py:161-183 palette, current-frame actors)
    img = jnp.zeros((w * w, 3), jnp.uint8)

    def paint(img, mask, color):
        return jnp.where(
            mask[:, None], jnp.asarray(color, jnp.uint8)[None, :], img
        )

    img = paint(img, road, (46, 52, 54))          # COLOR_ALUMINIUM_5
    img = paint(img, route, (136, 138, 133))      # COLOR_ALUMINIUM_3
    img = paint(img, lane_u8 == 255, (255, 0, 255))
    img = paint(img, lane_u8 == 120, (255, 140, 255))
    img = paint(img, tl_ch[-1] == 80, (0, 255, 0))
    img = paint(img, tl_ch[-1] == 170, (255, 255, 0))
    img = paint(img, tl_ch[-1] == 255, (255, 0, 0))
    img = paint(img, veh_ch[-1], (0, 0, 255))
    img = paint(img, wk_ch[-1], (0, 255, 255))
    ego_mask = _boxes_mask(
        px, xy[None, :], yaw[None], jnp.asarray([params.half_length]),
        jnp.asarray([params.half_width]),
    )
    img = paint(img, ego_mask, (255, 255, 255))
    rendered = img.reshape(w, w, 3)

    # collision_px: 1.1-scaled ego box vs latest walker mask
    ego_col = _boxes_mask(
        px, xy[None, :], yaw[None],
        jnp.asarray([params.half_length * 1.1]),
        jnp.asarray([params.half_width * 1.1]),
    )
    collision_px = jnp.any(ego_col & wk_mask_last)

    return masks, rendered, collision_px


def capsule_min_dist2_per_seg(px, seg_ab):
    """(P, S) squared distances (no min-reduce) for per-segment values.
    Delegates to ops/bev.py::capsule_dist2_all so the op order matches the
    Pallas kernels bit-for-bit."""
    from gail_carla_tpu.ops.bev import capsule_dist2_all

    return capsule_dist2_all(px, seg_ab)
