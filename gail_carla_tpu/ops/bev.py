"""On-device bird's-eye-view rendering by vector rasterization.

Replaces the reference's CPU rasterizer ``carla_gym/core/obs_manager/
birdview/chauffeurnet.py`` for the channels the policy actually consumes:
``carla_env.py:133-138`` feeds only birdview mask 0 = (road, route, lane) to
the network, so that's the hot path rendered here.

TPU-first design (see scene/segments.py for measurements): instead of
warping town textures (a per-pixel gather XLA compiles catastrophically on
this TPU stack), each output pixel computes its distance to a small set of
nearby capsule segments:

- road / lane-marking segments come from the ego's spatial-hash cell,
  fetched with one contiguous dynamic_slice;
- the "route ahead" band (reference draws route_plan[0:80] with a 16 px
  stroke, chauffeurnet.py:148-153) is the capsule union of the dense-route
  window starting at the env's route cursor, subsampled 4x.

Everything is a pure function of RenderState (xy, yaw, route_id, head), so
rollouts can store 4 scalars + a 2-vector per step and re-render
observations inside PPO/discriminator minibatches — the rematerialisation
trade that keeps 7k-step rollouts on-chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import StaticScene

ROUTE_WINDOW = 84       # dense points sliced at the cursor (>= 80 drawn)
ROUTE_STRIDE = 4        # subsample for capsule segments (20 segs over 80 m)
ROUTE_HALF_W = 1.6      # m; 16 px stroke at 5 px/m (chauffeurnet.py:152)
# (lane-marking half width is per-segment since round 3 — see
# StaticScene.cell_lane_w; graph-derived towns use
# segments.LANE_HALF_W_DEFAULT)
# mask values normalise by multiplying with the rounded f32 reciprocal —
# Mosaic lowers /255.0 as a reciprocal multiply, so using the explicit
# multiply on the XLA side keeps kernel and reference outputs bit-identical
INV_255 = 1.0 / 255.0


def pixel_world_coords(cfg: EnvConfig, xy, yaw):
    """(W*W, 2) world coordinates of each BEV pixel. Matches chauffeurnet's
    affine frame (``_get_warp_transform``, chauffeurnet.py:274-289): ego
    ``pixels_ev_to_bottom`` px above the bottom edge, heading up; columns
    span ego-right; scale bev_width/(bev_width-1) like the 3-point fit."""
    w = cfg.bev_width
    ppm = cfg.pixels_per_meter
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    fwd = jnp.stack([c, s])
    right = jnp.stack([-s, c])
    top_left = (
        xy + ((w - cfg.pixels_ev_to_bottom) / ppm) * fwd
        - (0.5 * w / ppm) * right
    )
    scale = w / (w - 1.0) / ppm
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(w, dtype=jnp.float32)
    # scale folded into the direction vectors first — the same op order as
    # the Pallas kernel (ops/bev_pallas.py) so outputs stay bit-identical
    px = (
        top_left[None, None, :]
        + cols[None, :, None] * (scale * right)[None, None, :]
        - rows[:, None, None] * (scale * fwd)[None, None, :]
    )
    return px.reshape(w * w, 2)


def capsule_dist2_all(px, seg_ab):
    """(P, S) squared distance from each pixel to each segment, in the same
    op order as the Pallas kernel's ``seg_d2`` (division hoisted to a
    per-segment reciprocal) so XLA and Mosaic outputs stay bit-identical."""
    a = seg_ab[None, :, :2]
    b = seg_ab[None, :, 2:]
    ab = b - a
    inv_denom = 1.0 / (jnp.sum(ab * ab, -1) + 1e-9)
    aab = jnp.sum(a * ab, -1)
    t = jnp.clip(
        (jnp.sum(px[:, None, :] * ab, -1) - aab) * inv_denom, 0.0, 1.0
    )
    d = (px[:, None, :] - a) - t[..., None] * ab
    return jnp.sum(d * d, -1)


def capsule_min_dist2(px, seg_ab):
    """(P,) min squared distance from each pixel to any segment.
    px: (P, 2); seg_ab: (S, 4)."""
    return jnp.min(capsule_dist2_all(px, seg_ab), axis=1)


def boundary_dist_cross(px, bnd_segs):
    """(P, S) squared distance AND length-normalized cross vs oriented
    boundary edges, op-ordered like the Pallas kernels' ``bnd_body`` for
    bit-identity. cross(b-a, p-closest)/|b-a| > 0 means p is on the edge's
    interior side; the normalization makes |crn| comparable across edges
    (it equals |p-closest|·sin of the edge/offset angle), which the robust
    vertex-tie resolution in ``boundary_inside`` relies on."""
    ax = bnd_segs[None, :, 0]
    ay = bnd_segs[None, :, 1]
    abx = bnd_segs[None, :, 2] - ax
    aby = bnd_segs[None, :, 3] - ay
    inv_denom = 1.0 / (abx * abx + aby * aby + 1e-9)
    inv_len = jnp.sqrt(inv_denom)
    # per-edge scalar coefficients folded once (the kernels hoist these to
    # the SPU): t = pxx*tx + pxy*ty - tc, crn = nx*dy - ny*dx
    tx = abx * inv_denom
    ty = aby * inv_denom
    tc = (ax * abx + ay * aby) * inv_denom
    nx = abx * inv_len
    ny = aby * inv_len
    pxx = px[:, None, 0]
    pxy = px[:, None, 1]
    t = jnp.clip(pxx * tx + pxy * ty - tc, 0.0, 1.0)
    dx = (pxx - ax) - t * abx
    dy = (pxy - ay) - t * aby
    d2 = dx * dx + dy * dy
    crn = nx * dy - ny * dx
    return d2, crn


def boundary_inside(px, bnd_segs, dmax):
    """(P,) bool: pixel inside the oriented-contour region.

    Test: the NEAREST boundary edge's cross sign (interior = positive),
    guarded by ``d2 <= dmax^2``. Correctness with cell-local tables
    (segments.py::build_bnd_cells margin = pixel_reach + dmax): any pixel
    within dmax of its true nearest edge finds that edge in the table, and
    any pixel farther than dmax from every edge is provably outside (dmax
    is the mask's deepest interior point), which the guard enforces.

    Tie resolution: at a shared VERTEX of two edges both are exactly
    equidistant, and every point whose nearest feature is that vertex — a
    2D cone reaching up to dmax into the interior — would get a floating-
    point-noise inside sign from a plain argmin (the round-3 phantom
    static collisions on plain road). The robust pick (angle-weighted
    pseudo-normal rule collapsed to candidates) is folded into ONE select
    per edge: minimize ``key = d2 - 1e-3*|crn|``. For genuinely distinct
    edges the d2 term dominates (misordering needs a true-d2 gap under
    ~0.016 m^2 — physically a tie anyway); at an exact vertex tie the
    |normalized cross| term (= |offset|*sin of the edge/offset angle, the
    unambiguous-sign edge) decides. Bit-identical to the kernels'
    running-best carry (bev_pallas.py::bnd_body) and semantically equal
    to host ``mask_geo._nearest_edge_robust``. The dmax guard uses keymin
    (underestimates d2 by <= 1e-3*dmax — absorbed by dmax's own +0.75 px
    slack, mask_geo.mask_boundary_edges)."""
    d2, crn = boundary_dist_cross(px, bnd_segs)
    key = d2 - 1e-3 * jnp.abs(crn)
    keymin = jnp.min(key, axis=1)
    m = key == keymin[:, None]
    first = m & (jnp.cumsum(m.astype(jnp.int32), axis=1) == 1)
    cr_sel = jnp.sum(jnp.where(first, crn, 0.0), axis=1)
    return (cr_sel > 0.0) & (keymin <= dmax * dmax)


def _cell_of(scene: StaticScene, xy):
    gy, gx = scene.cell_road.shape[:2]
    cell = jnp.floor((xy - scene.cell_grid_lo) / scene.cell_size).astype(
        jnp.int32
    )
    cx = jnp.clip(cell[0], 0, gx - 1)
    cy = jnp.clip(cell[1], 0, gy - 1)
    return cy, cx


def fetch_cell(scene: StaticScene, xy):
    """One env's (road_segs (Mr,4), road_flag (Mr,), lane_segs (Ml,4),
    lane_val (Ml,), lane_w (Ml,)) via contiguous dynamic_slice — the
    gather-free spatial hash lookup."""
    cy, cx = _cell_of(scene, xy)
    mr = scene.cell_road.shape[2]
    ml = scene.cell_lane.shape[2]
    road = jax.lax.dynamic_slice(
        scene.cell_road, (cy, cx, 0, 0), (1, 1, mr, 4)
    )[0, 0]
    road_flag = jax.lax.dynamic_slice(
        scene.cell_road_flag, (cy, cx, 0), (1, 1, mr)
    )[0, 0]
    lane = jax.lax.dynamic_slice(
        scene.cell_lane, (cy, cx, 0, 0), (1, 1, ml, 4)
    )[0, 0]
    lane_val = jax.lax.dynamic_slice(
        scene.cell_lane_val, (cy, cx, 0), (1, 1, ml)
    )[0, 0]
    lane_w = jax.lax.dynamic_slice(
        scene.cell_lane_w, (cy, cx, 0), (1, 1, ml)
    )[0, 0]
    return road, road_flag, lane, lane_val, lane_w


def fetch_bnd_cell(scene: StaticScene, xy):
    """One env's oriented road-boundary edges: (segs (Mb, 4), n_live)."""
    cy, cx = _cell_of(scene, xy)
    mb = scene.cell_bnd.shape[2]
    segs = jax.lax.dynamic_slice(
        scene.cell_bnd, (cy, cx, 0, 0), (1, 1, mb, 4)
    )[0, 0]
    n = jax.lax.dynamic_slice(scene.cell_bnd_n, (cy, cx), (1, 1))[0, 0]
    return segs, n


def fetch_hard_cell(scene: StaticScene, xy):
    """One env's oriented hard-surface (curb-to-wall) boundary edges:
    (segs (Mh, 4), n_live) — the layout-collision geometry
    (sim/collisions.py::static_collision). Aliases the road boundary on
    procedural towns (scene.py::build_scene)."""
    cy, cx = _cell_of(scene, xy)
    mh = scene.cell_hard.shape[2]
    segs = jax.lax.dynamic_slice(
        scene.cell_hard, (cy, cx, 0, 0), (1, 1, mh, 4)
    )[0, 0]
    n = jax.lax.dynamic_slice(scene.cell_hard_n, (cy, cx), (1, 1))[0, 0]
    return segs, n


def fetch_cell_counts(scene: StaticScene, xy):
    """(n_bnd, n_lane) live segment counts of the ego's cell — dynamic
    trip counts for the Pallas loops (the tables are padded to the busiest
    cell; the mean cell is ~25-35% full)."""
    cy, cx = _cell_of(scene, xy)
    nb = jax.lax.dynamic_slice(scene.cell_bnd_n, (cy, cx), (1, 1))[0, 0]
    nl = jax.lax.dynamic_slice(scene.cell_lane_n, (cy, cx), (1, 1))[0, 0]
    return nb, nl


def fetch_tl_cell(scene: StaticScene, xy):
    """One env's nearby traffic-light stop lines: (segs (Mt, 4),
    src_idx (Mt,), n_live) — the bev6 kernel's culled light table
    (segments.py::build_tl_cells margin rule keeps this bit-exact vs
    streaming every light)."""
    gy, gx = scene.cell_tl.shape[:2]
    cell = jnp.floor((xy - scene.cell_grid_lo) / scene.cell_size).astype(
        jnp.int32
    )
    cx = jnp.clip(cell[0], 0, gx - 1)
    cy = jnp.clip(cell[1], 0, gy - 1)
    mt = scene.cell_tl.shape[2]
    segs = jax.lax.dynamic_slice(
        scene.cell_tl, (cy, cx, 0, 0), (1, 1, mt, 4)
    )[0, 0]
    idx = jax.lax.dynamic_slice(
        scene.cell_tl_idx, (cy, cx, 0), (1, 1, mt)
    )[0, 0]
    n = jax.lax.dynamic_slice(scene.cell_tl_n, (cy, cx), (1, 1))[0, 0]
    return segs, idx, n


def route_window_segs(scene: StaticScene, route_id, head):
    """(K, 4) capsule segments of the route ahead of the cursor."""
    win = jax.lax.dynamic_slice(
        scene.route_xy,
        (route_id, head, 0),
        (1, ROUTE_WINDOW, 2),
    )[0]
    pts = win[::ROUTE_STRIDE]
    return jnp.concatenate([pts[:-1], pts[1:]], axis=1)


def render_bev(
    scene: StaticScene,
    cfg: EnvConfig,
    xy: jnp.ndarray,
    yaw: jnp.ndarray,
    route_id: jnp.ndarray,
    head: jnp.ndarray,
) -> jnp.ndarray:
    """(3, W, W) float32 in [0, 1]: channels (road, route, lane) — the
    policy observation (mask 0 of the reference, loaded from PNG as RGB and
    ToTensor'd in carla_env.py:102-138 / wdgail.py:136-241). The road
    channel is the exact town road mask via the oriented-boundary sign
    test (chauffeurnet.py:142-143 warps the H5 ``road`` texture; here the
    same mask is reproduced analytically — scene/mask_geo.py)."""
    w = cfg.bev_width
    px = pixel_world_coords(cfg, xy, yaw)
    _, _, lane_segs, lane_val, lane_w = fetch_cell(scene, xy)
    bnd_segs, _ = fetch_bnd_cell(scene, xy)
    route_segs = route_window_segs(scene, route_id, head)

    road_ch = boundary_inside(px, bnd_segs, scene.bnd_dmax).astype(
        jnp.float32
    )

    route_d2 = capsule_min_dist2(px, route_segs)
    route_ch = (route_d2 <= ROUTE_HALF_W**2).astype(jnp.float32)

    # lane channel keeps per-segment values: a pixel takes the max value of
    # any marking covering it (solid 255 beats broken 120)
    d2 = capsule_dist2_all(px, lane_segs)
    hit = d2 <= lane_w[None, :] ** 2
    lane_ch = jnp.max(
        jnp.where(hit, lane_val[None, :], 0.0), axis=1
    ) * INV_255

    img = jnp.stack([road_ch, route_ch, lane_ch], axis=0)
    return img.reshape(3, w, w)


def _flatten_lead(tree, lead_shape):
    """reshape(-1, ...) fails on zero-size leaves (NPC arrays with K=0):
    infer the leading size explicitly instead."""
    import math

    n = math.prod(lead_shape) if lead_shape else 1
    import jax

    return jax.tree.map(
        lambda a: a.reshape((n,) + a.shape[len(lead_shape):]), tree
    )


def render_bev_batch_auto(scene, cfg, render_state):
    """Backend-dispatching batch renderer: the fused Pallas kernel on TPU
    (ops/bev_pallas.py — ~3x the XLA version, bit-identical output), the
    XLA path elsewhere. Decided at trace time."""
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        from gail_carla_tpu.ops.bev_pallas import render_bev_pallas_batch

        return render_bev_pallas_batch(scene, cfg, render_state)
    return render_bev_batch(scene, cfg, render_state)


def render_bev_batch(scene, cfg, render_state, chunk: int = 256):
    """vmap over a RenderState batch (any leading shape), scanning in
    chunks of ``chunk`` envs: the (pixels x segments) distance intermediate
    is ~5 MB/env, so an unchunked 4096-env render would materialise ~19 GB
    and OOM the chip."""
    lead = render_state.yaw.shape
    flat = _flatten_lead(render_state, lead)
    n = flat.yaw.shape[0]
    vrender = jax.vmap(
        lambda r: render_bev(scene, cfg, r.xy, r.yaw, r.route_id, r.head)
    )
    if n <= chunk or n % chunk != 0:
        imgs = vrender(flat)
    else:
        chunked = jax.tree.map(
            lambda a: a.reshape((n // chunk, chunk) + a.shape[1:]), flat
        )
        _, imgs = jax.lax.scan(
            lambda _, r: (None, vrender(r)), None, chunked
        )
        imgs = imgs.reshape((n,) + imgs.shape[2:])
    return imgs.reshape(lead + imgs.shape[1:])
