"""Pallas TPU kernel for the 6-channel bev6 observation.

Extends ops/bev_pallas.py with three streamed mask channels:
- signals: stop-line capsules taking per-line values (80/170/255 by current
  phase, computed outside the kernel since phase = f(sim_time)) + the active
  stop-sign box at 255;
- vehicles / walkers: point-in-OBB over the current-frame actor boxes.

Same VMEM-accumulator structure as the 3-channel kernel: all per-pixel
intermediates stay on-chip; scalars stream from VMEM/SMEM refs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.ops import bev as bev_xla
from gail_carla_tpu.ops.bev import INV_255
from gail_carla_tpu.ops.bev_full import TL_LINE_HALF_W, WALKER_HALF
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.dynamics import DEFAULT_VEHICLE


def _kernel(
    counts_ref,    # (1, 1, 3) i32 [n_bnd, n_lane, n_tl] live        SMEM
    pose_ref,      # (1, 1, 4) f32 [x, y, cos, sin]                 VMEM
    bnd_ref,       # (1, Mb, 4) oriented boundary edges              VMEM
    lane_ref,      # (1, Ml, 4)                                      VMEM
    laneval_ref,   # (1, 1, Ml)                                      SMEM
    lanew_ref,     # (1, 1, Ml) per-segment half width               SMEM
    route_ref,     # (1, K, 4)                                       VMEM
    tl_ref,        # (1, Mt, 4) culled stop-line segs                VMEM
    tlval_ref,     # (1, 1, Mt) per-line value (0 = not drawn)       SMEM
    box_ref,       # (1, B, 8) x, y, cos, sin, hl, hw, ch, pad       VMEM
    out_ref,       # (1, 6, W, W)                                    VMEM
    *,
    w: int,
    ppm: float,
    ptb: int,
    dmax: float,
    route_half: float,
    tl_half: float,
):
    x = pose_ref[0, 0, 0]
    y = pose_ref[0, 0, 1]
    c = pose_ref[0, 0, 2]
    s = pose_ref[0, 0, 3]

    # flat (w*w/128, 128) pixel layout — see ops/bev_pallas.py
    p = (w * w) // 128
    scale = (w / (w - 1.0)) / ppm
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (p, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (p, 128), 1)
    )
    rows = (flat // w).astype(jnp.float32)
    cols = (flat % w).astype(jnp.float32)
    tl_x = x + ((w - ptb) / ppm) * c - (0.5 * w / ppm) * (-s)
    tl_y = y + ((w - ptb) / ppm) * s - (0.5 * w / ppm) * c
    pxx = tl_x + cols * (scale * -s) - rows * (scale * c)
    pxy = tl_y + cols * (scale * c) - rows * (scale * s)

    big = jnp.float32(1.0e12)

    def seg_d2(seg_ref, i):
        # scalar per-segment math (incl. the reciprocal) on the SPU;
        # multiply-adds only on the VPU — same op order as ops/bev.py
        ax = seg_ref[0, i, 0]
        ay = seg_ref[0, i, 1]
        abx = seg_ref[0, i, 2] - ax
        aby = seg_ref[0, i, 3] - ay
        inv_denom = 1.0 / (abx * abx + aby * aby + 1e-9)
        aab = ax * abx + ay * aby
        t = jnp.clip(
            (pxx * abx + pxy * aby - aab) * inv_denom, 0.0, 1.0
        )
        dx = (pxx - ax) - t * abx
        dy = (pxy - ay) - t * aby
        return dx * dx + dy * dy

    # Short segment loops are overhead-bound, not VPU-bound — unroll 8x.
    # Dynamic counts round UP (cell tables padded to a multiple of 8 with
    # FAR sentinels, segments.py pad_mult=8 — extra reads are in-bounds
    # and bit-exact); static counts take an exact-remainder path.
    UNROLL = 8

    def min_d2_over(seg_ref, n):
        # n = live count (dynamic); padded FAR tails never win the min
        def body(i, acc):
            return jnp.minimum(acc, seg_d2(seg_ref, i))

        init = jnp.full((p, 128), big, jnp.float32)

        def body_u(i, acc):
            for j in range(UNROLL):
                acc = body(i * UNROLL + j, acc)
            return acc

        if isinstance(n, int):
            main = n - (n % UNROLL)
            acc = jax.lax.fori_loop(0, main // UNROLL, body_u, init)
            for i in range(main, n):
                acc = body(i, acc)
            return acc
        return jax.lax.fori_loop(0, (n + UNROLL - 1) // UNROLL, body_u,
                                 init)

    def seg_d2_cross(seg_ref, i):
        # boundary edge distance + LENGTH-NORMALIZED oriented cross
        # (ops/bev.py::boundary_dist_cross op order for bit-identity);
        # per-edge coefficients are scalar work on the SPU
        ax = seg_ref[0, i, 0]
        ay = seg_ref[0, i, 1]
        abx = seg_ref[0, i, 2] - ax
        aby = seg_ref[0, i, 3] - ay
        inv_denom = 1.0 / (abx * abx + aby * aby + 1e-9)
        inv_len = jnp.sqrt(inv_denom)
        tx = abx * inv_denom
        ty = aby * inv_denom
        tc = (ax * abx + ay * aby) * inv_denom
        nx = abx * inv_len
        ny = aby * inv_len
        t = jnp.clip(pxx * tx + pxy * ty - tc, 0.0, 1.0)
        dx = (pxx - ax) - t * abx
        dy = (pxy - ay) - t * aby
        return dx * dx + dy * dy, nx * dy - ny * dx

    # vertex ties folded into one select via key = d2 - 1e-3*|crn|
    # (ops/bev.py::boundary_inside robust rule; see bev_pallas.py)
    def bnd_body(i, carry):
        keymin, crb = carry
        d2, crn = seg_d2_cross(bnd_ref, i)
        key = d2 - 1e-3 * jnp.abs(crn)
        take = key < keymin
        return (jnp.where(take, key, keymin), jnp.where(take, crn, crb))

    def bnd_body_u(i, carry):
        for j in range(UNROLL):
            carry = bnd_body(i * UNROLL + j, carry)
        return carry

    bnd_d2, bnd_cr = jax.lax.fori_loop(
        0, (counts_ref[0, 0, 0] + UNROLL - 1) // UNROLL, bnd_body_u,
        (jnp.full((p, 128), big, jnp.float32),
         jnp.zeros((p, 128), jnp.float32)),
    )
    route_d2 = min_d2_over(route_ref, route_ref.shape[1])

    def lane_body(i, acc):
        lw = lanew_ref[0, 0, i]
        hit = seg_d2(lane_ref, i) <= lw * lw
        return jnp.maximum(acc, jnp.where(hit, laneval_ref[0, 0, i], 0.0))

    def lane_body_u(i, acc):
        for j in range(UNROLL):
            acc = lane_body(i * UNROLL + j, acc)
        return acc

    lane_v = jax.lax.fori_loop(
        0, (counts_ref[0, 0, 1] + UNROLL - 1) // UNROLL, lane_body_u,
        jnp.zeros((p, 128), jnp.float32),
    )

    # --- signals: valued stop-line capsules ---
    def tl_body(i, acc):
        hit = seg_d2(tl_ref, i) <= tl_half * tl_half
        return jnp.maximum(acc, jnp.where(hit, tlval_ref[0, 0, i], 0.0))

    def tl_body_u(i, acc):
        for j in range(4):   # tl tables pad to a multiple of 4
            acc = tl_body(i * 4 + j, acc)
        return acc

    sig = jax.lax.fori_loop(
        0, (counts_ref[0, 0, 2] + 3) // 4, tl_body_u,
        jnp.zeros((p, 128), jnp.float32),
    )

    # --- boxes: OBBs carrying a channel selector (0=sig, 1=veh, 2=walker)
    def box_body(i, accs):
        sig, veh, wk = accs
        bx = box_ref[0, i, 0]
        by = box_ref[0, i, 1]
        bc = box_ref[0, i, 2]
        bs = box_ref[0, i, 3]
        hl = box_ref[0, i, 4]
        hw = box_ref[0, i, 5]
        ch = box_ref[0, i, 6]
        dx = pxx - bx
        dy = pxy - by
        lx = dx * bc + dy * bs
        ly = -dx * bs + dy * bc
        inside = (
            (jnp.abs(lx) <= hl) & (jnp.abs(ly) <= hw)
        ).astype(jnp.float32)
        sig = jnp.maximum(sig, jnp.where(ch == 0.0, inside * 255.0, 0.0))
        veh = jnp.maximum(veh, jnp.where(ch == 1.0, inside, 0.0))
        wk = jnp.maximum(wk, jnp.where(ch == 2.0, inside, 0.0))
        return sig, veh, wk

    nbox = box_ref.shape[1]
    main = nbox - (nbox % UNROLL)

    def box_body_u(i, accs):
        for j in range(UNROLL):
            accs = box_body(i * UNROLL + j, accs)
        return accs

    accs = jax.lax.fori_loop(
        0, main // UNROLL, box_body_u,
        (sig, jnp.zeros((p, 128), jnp.float32),
         jnp.zeros((p, 128), jnp.float32)),
    )
    for i in range(main, nbox):
        accs = box_body(i, accs)
    sig, veh, wk = accs

    out_ref[0, 0] = (
        (bnd_cr > 0.0) & (bnd_d2 <= dmax * dmax)
    ).astype(jnp.float32)
    out_ref[0, 1] = (route_d2 <= route_half * route_half).astype(jnp.float32)
    out_ref[0, 2] = lane_v * INV_255
    out_ref[0, 3] = sig * INV_255
    out_ref[0, 4] = veh
    out_ref[0, 5] = wk


def render_bev6_pallas_batch(
    scene: StaticScene, cfg: EnvConfig, render_state,
    interpret: bool = False,
) -> jnp.ndarray:
    from gail_carla_tpu.ops.bev import _flatten_lead

    lead = render_state.yaw.shape
    flat = _flatten_lead(render_state, lead)
    n = flat.yaw.shape[0]
    w = cfg.bev_width

    pose = jnp.stack(
        [flat.xy[:, 0], flat.xy[:, 1], jnp.cos(flat.yaw),
         jnp.sin(flat.yaw)], axis=1,
    )[:, None, :]
    _, _, lane, lane_val, lane_w = jax.vmap(
        lambda xy: bev_xla.fetch_cell(scene, xy)
    )(flat.xy)
    bnd, _ = jax.vmap(
        lambda xy: bev_xla.fetch_bnd_cell(scene, xy)
    )(flat.xy)
    route = jax.vmap(
        lambda r, h: bev_xla.route_window_segs(scene, r, h)
    )(flat.route_id, flat.head)
    nb, nl = jax.vmap(
        lambda xy: bev_xla.fetch_cell_counts(scene, xy)
    )(flat.xy)

    # per-line signal values from the phase at each env's sim time, on the
    # CULLED per-cell light table (segments.py::build_tl_cells) — the
    # kernel streams only the lights this cell can see
    T = scene.tl_stop.shape[0]
    sim_time = flat.step.astype(jnp.float32) * cfg.dt
    states = jax.vmap(lambda t: signals.light_states(scene, t))(sim_time)
    tl_val_all = jnp.where(
        states == signals.GREEN, 80.0,
        jnp.where(states == signals.YELLOW, 170.0, 255.0),
    )
    tl_val_all = jnp.where(
        (jnp.arange(T) < scene.tl_n)[None, :], tl_val_all, 0.0
    )
    tl_segs, tl_idx, nt = jax.vmap(
        lambda xy: bev_xla.fetch_tl_cell(scene, xy)
    )(flat.xy)
    # gather-free per-env value pick: one-hot (Mt, T) @ values (T,)
    tl_val = jnp.einsum(
        "nmt,nt->nm",
        jax.nn.one_hot(tl_idx, T, dtype=tl_val_all.dtype),
        tl_val_all,
    )
    counts = jnp.stack([nb, nl, nt], axis=1).astype(jnp.int32)[:, None, :]

    # box table: active stop sign (channel 0) + vehicles (1) + walkers (2)
    S = scene.ss_center.shape[0]
    ss_half = jnp.maximum(scene.ss_extent[:, 0], scene.ss_extent[:, 1])

    def stop_box(r):
        active = jnp.arange(S) == r.stop_idx
        half = jnp.max(jnp.where(active, ss_half, 0.0))
        cx = jnp.sum(jnp.where(active, scene.ss_center[:, 0], 0.0))
        cy = jnp.sum(jnp.where(active, scene.ss_center[:, 1], 0.0))
        yaw = jnp.sum(jnp.where(active, scene.ss_yaw, 0.0))
        return jnp.stack([
            cx, cy, jnp.cos(yaw), jnp.sin(yaw),
            jnp.where(half > 0, half, -1.0),
            jnp.where(half > 0, half, -1.0),
            0.0, 0.0,
        ])

    def actor_boxes(pose3, hl, hw, ch):
        return jnp.concatenate(
            [
                pose3[:, :2],
                jnp.cos(pose3[:, 2:3]), jnp.sin(pose3[:, 2:3]),
                jnp.full((pose3.shape[0], 1), hl),
                jnp.full((pose3.shape[0], 1), hw),
                jnp.full((pose3.shape[0], 1), ch),
                jnp.zeros((pose3.shape[0], 1)),
            ],
            axis=1,
        )

    K = flat.npc_pose.shape[1]
    Wn = flat.walker_pose.shape[1]
    boxes = jax.vmap(
        lambda r: jnp.concatenate(
            [
                stop_box(r)[None],
                actor_boxes(
                    r.npc_pose, DEFAULT_VEHICLE.half_length,
                    DEFAULT_VEHICLE.half_width, 1.0,
                ),
                actor_boxes(
                    r.walker_pose, WALKER_HALF[0], WALKER_HALF[1], 2.0
                ),
            ],
            axis=0,
        )
    )(flat)
    nb_boxes = 1 + K + Wn

    if (w * w) % 128 != 0:  # flat-pixel layout needs whole lanes
        from gail_carla_tpu.ops.bev6 import render_bev6_batch

        return render_bev6_batch(scene, cfg, render_state)
    p128 = (w * w) // 128

    mb = bnd.shape[1]
    ml = lane.shape[1]
    k = route.shape[1]
    mt = tl_segs.shape[1]
    nbox = nb_boxes
    kernel = functools.partial(
        _kernel, w=w, ppm=cfg.pixels_per_meter,
        ptb=cfg.pixels_ev_to_bottom, dmax=scene.bnd_dmax,
        route_half=bev_xla.ROUTE_HALF_W,
        tl_half=TL_LINE_HALF_W,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ml, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ml), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ml), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mt), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nbox, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 6, p128, 128), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 6, p128, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n * w * w * (mb + ml + k + mt + nbox) * 12,
            bytes_accessed=n * (6 * w * w * 4
                                + (mb + ml + k + mt + nbox) * 32),
            transcendentals=0,
        ),
        interpret=interpret,
    )(counts, pose, bnd, lane, lane_val[:, None, :], lane_w[:, None, :],
      route, tl_segs, tl_val[:, None, :], boxes)
    return out.reshape(lead + (6, w, w))
