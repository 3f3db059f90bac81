"""Pallas TPU kernel: fused BEV capsule rasterizer.

The XLA version (ops/bev.py) materialises a (pixels x segments) distance
matrix per env (~7.6 MB — past VMEM, so it spills to HBM) before the min
reduction; measured ~160 GFLOP/s. This kernel keeps three (192,192)
accumulators in VMEM and streams segments through registers, so the whole
raster is compute-bound on the VPU.

Grid: one program per env. Inputs are the per-env segment tables
pre-gathered with dynamic_slice (cheap; see scene/segments.py) plus the ego
pose; output is the (3, W, W) float32 (road, route, lane) observation,
bit-identical semantics to ops/bev.py::render_bev.
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
from gail_carla_tpu.scene.scene import StaticScene


def _kernel(
    counts_ref,     # (1, 1, 2) i32 [n_bnd, n_lane] live segs         SMEM
    pose_ref,       # (1, 1, 4) f32 [x, y, cos yaw, sin yaw]         VMEM
    bnd_ref,        # (1, Mb, 4) oriented boundary edges              VMEM
    lane_ref,       # (1, Ml, 4)                                      VMEM
    laneval_ref,    # (1, 1, Ml)                                      SMEM
    lanew_ref,      # (1, 1, Ml) per-segment half width               SMEM
    route_ref,      # (1, K, 4)                                       VMEM
    out_ref,        # (1, 3, P, 128) flat-pixel layout                VMEM
    *,
    w: int,
    ppm: float,
    ptb: int,
    dmax: float,
    route_half: float,
):
    x = pose_ref[0, 0, 0]
    y = pose_ref[0, 0, 1]
    c = pose_ref[0, 0, 2]
    s = pose_ref[0, 0, 3]

    # pixel world coordinates (see ops/bev.py::pixel_world_coords),
    # computed on a flat (w*w/128, 128) layout so every VPU lane is live
    # (a (192,192) block pads its minor dim to 256 — 25% idle lanes)
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
        """Per-pixel squared distance to segment i. All per-segment values
        are scalars (SPU), so the vector pipeline runs multiply-adds only —
        in particular the 1/denom division is hoisted off the VPU."""
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

    # Short segment loops are bound by per-iteration scalar-load/branch
    # overhead, not VPU math (measured ~40% of render marginal at 256
    # envs) — unroll them. Dynamic (live-count) loops round the trip
    # count UP to the unroll factor: cell tables are padded to a multiple
    # of 8 (segments.py pad_mult=8) with FAR sentinels whose d2 ~ 1e14
    # never wins a min, so the extra reads are in-bounds and bit-exact.
    UNROLL = 8

    def min_d2_over(seg_ref, n):
        """n is the cell's LIVE count (dynamic trip count) — the padded
        tail is FAR sentinels whose d2 ~ 1e14 never wins the min, so
        skipping it is bit-exact. Static n (route window, not a padded
        cell table) takes the exact-remainder path: no sentinel rows
        exist past the block, so reads must stay in-bounds."""

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
        """Like seg_d2 but also the LENGTH-NORMALIZED cross of the edge
        with p-closest — the oriented-boundary inside sign
        (ops/bev.py::boundary_dist_cross op order, for bit-identity with
        the XLA reference). All per-edge coefficients (tx/ty/tc/nx/ny)
        are scalars on the SPU; the vector pipeline runs multiply-adds
        only."""
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

    # road channel: nearest oriented boundary edge decides inside/outside.
    # Vertex ties (two edges exactly equidistant at a shared corner) get a
    # fp-noise sign from a strict-< argmin (phantom road holes / static
    # collisions); minimizing key = d2 - 1e-3*|crn| folds the robust
    # larger-|normalized-cross| tie-break into one select per edge
    # (ops/bev.py::boundary_inside, op-order identical)
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

    # lane channel carries the max marking value within per-segment reach
    def lane_body(i, acc):
        lw = lanew_ref[0, 0, i]
        hit = seg_d2(lane_ref, i) <= lw * lw
        return jnp.maximum(
            acc, jnp.where(hit, laneval_ref[0, 0, i], 0.0)
        )

    def lane_body_u(i, acc):
        for j in range(UNROLL):
            acc = lane_body(i * UNROLL + j, acc)
        return acc

    lane_v = jax.lax.fori_loop(
        0, (counts_ref[0, 0, 1] + UNROLL - 1) // UNROLL, lane_body_u,
        jnp.zeros((p, 128), jnp.float32),
    )

    out_ref[0, 0] = (
        (bnd_cr > 0.0) & (bnd_d2 <= dmax * dmax)
    ).astype(jnp.float32)
    out_ref[0, 1] = (route_d2 <= route_half * route_half).astype(jnp.float32)
    out_ref[0, 2] = lane_v * INV_255


def render_bev_pallas_batch(
    scene: StaticScene, cfg: EnvConfig, render_state, interpret: bool = False
) -> jnp.ndarray:
    """(N, 3, W, W) float32 — drop-in for ops/bev.py::render_bev_batch on
    TPU (same channel semantics; ops/bev.py remains the CPU/interpret
    reference implementation the tests compare against)."""
    from gail_carla_tpu.ops.bev import _flatten_lead

    lead = render_state.yaw.shape
    flat = _flatten_lead(render_state, lead)
    n = flat.yaw.shape[0]
    w = cfg.bev_width

    pose = jnp.stack(
        [flat.xy[:, 0], flat.xy[:, 1], jnp.cos(flat.yaw),
         jnp.sin(flat.yaw)], axis=1,
    )[:, None, :]                      # (N, 1, 4) for Mosaic block rules
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
    counts = jnp.stack([nb, nl], axis=1).astype(jnp.int32)[:, None, :]

    if (w * w) % 128 != 0:  # flat-pixel layout needs whole lanes
        return bev_xla.render_bev_batch(scene, cfg, render_state)
    p128 = (w * w) // 128

    mb = bnd.shape[1]
    ml = lane.shape[1]
    k = route.shape[1]
    kernel = functools.partial(
        _kernel,
        w=w,
        ppm=cfg.pixels_per_meter,
        ptb=cfg.pixels_ev_to_bottom,
        dmax=scene.bnd_dmax,
        route_half=bev_xla.ROUTE_HALF_W,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
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
        ],
        out_specs=pl.BlockSpec(
            (1, 3, p128, 128), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 3, p128, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n * w * w * (mb + ml + k) * 12,
            bytes_accessed=n * (3 * w * w * 4 + (mb + ml + k) * 16),
            transcendentals=0,
        ),
        interpret=interpret,
    )(counts, pose, bnd, lane, lane_val[:, None, :], lane_w[:, None, :],
      route)
    return out.reshape(lead + (3, w, w))
