"""Ground-truth fidelity: reconstructed towns vs the reference's shipped H5
mask packs (VERDICT r2 lead item).

- mask_geo primitives: oriented marching-squares contours reproduce
  arbitrary synthetic masks exactly at pixel centres (incl. holes);
- Town01: >= 99% of lane-graph and dense-route points lie inside the H5
  road mask after repair; every synthesized traffic-light stop line sits
  on the road;
- Town01 BEV: per-channel IoU of our render vs a host-side warp of the
  actual H5 textures (the reference's chauffeurnet.py:142-153 pipeline).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gail_carla_tpu.scene import mask_geo

H5_DIR = "/root/reference/carla_gym/core/obs_manager/birdview/maps"
needs_h5 = pytest.mark.skipif(
    not os.path.isdir(H5_DIR), reason="reference H5 packs not present"
)


# ---------------------------------------------------------------------------
# mask_geo primitives
# ---------------------------------------------------------------------------

def _random_mask(seed, shape=(96, 96)):
    rng = np.random.default_rng(seed)
    m = np.zeros(shape, bool)
    for _ in range(6):
        cy, cx = rng.integers(10, shape[0] - 10, 2)
        r = rng.integers(4, 18)
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    # punch a hole
    cy, cx = rng.integers(20, shape[0] - 20, 2)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    m &= ~((yy - cy) ** 2 + (xx - cx) ** 2 <= 36)
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_contour_inside_test_exact(seed):
    m = _random_mask(seed)
    off = np.array([3.0, -7.0])
    edges, dmax = mask_geo.mask_boundary_edges(m, off, 2.0, max_err_px=0.3)
    ys, xs = np.mgrid[: m.shape[0], : m.shape[1]]
    pts = np.stack([xs.ravel(), ys.ravel()], 1) / 2.0 + off[None, :]
    inside = mask_geo.points_inside(edges, dmax, pts)
    assert (inside == m.ravel()).all()


def test_contour_orientation_interior_positive():
    # a simple filled rectangle: cross(b-a, p-a) must be > 0 for the centre
    m = np.zeros((20, 20), bool)
    m[5:15, 4:16] = True
    edges, dmax = mask_geo.mask_boundary_edges(
        m, np.zeros(2), 1.0, max_err_px=0.2
    )
    sd = mask_geo.boundary_signed_distance(edges, np.array([[10.0, 10.0]]))
    assert sd[0] > 0
    sd_out = mask_geo.boundary_signed_distance(edges, np.array([[1.0, 1.0]]))
    assert sd_out[0] < 0


def test_stroke_capsules_cover_thin_lines():
    m = np.zeros((64, 64), bool)
    m[10, 5:60] = True            # 1-px horizontal stroke
    m[20:55, 30] = True           # 1-px vertical stroke
    ab, val, hw = mask_geo.mask_stroke_capsules(
        m, np.zeros(2), 1.0, 255.0
    )
    assert len(ab) >= 2
    ys, xs = np.nonzero(m)
    pts = np.stack([xs, ys], 1).astype(float)
    from numpy.linalg import norm

    a = ab[None, :, :2]
    d = (ab[:, 2:] - ab[:, :2])[None]
    t = np.clip(
        np.sum((pts[:, None, :] - a) * d, -1)
        / (np.sum(d * d, -1) + 1e-12),
        0, 1,
    )
    dist = norm(pts[:, None, :] - (a + t[..., None] * d), axis=-1)
    # all stroke pixels within a pixel of some capsule
    assert (dist.min(axis=1) <= 1.0).mean() > 0.97


# ---------------------------------------------------------------------------
# Town fidelity (reference H5 ground truth)
# ---------------------------------------------------------------------------

@needs_h5
def test_town01_graph_and_routes_inside_road_mask():
    from gail_carla_tpu.scene.h5_maps import load_town_geometry
    from gail_carla_tpu.scene.town_import import (
        benchmark_routes, build_town_graph, collect_town_routes,
        densify_route, repair_dense_route, repair_graph_to_mask,
    )

    geo = load_town_geometry("Town01")
    graph = repair_graph_to_mask(
        build_town_graph(collect_town_routes("Town01")), geo
    )
    pts = np.concatenate([e.pts for e in graph.edges], axis=0)
    sd = mask_geo.boundary_signed_distance(geo.bnd_ab, pts)
    assert (sd > 0).mean() >= 0.99, f"graph on-road {(sd > 0).mean():.4f}"

    for r in benchmark_routes("Town01")[:3]:
        d = repair_dense_route(densify_route(r.waypoints), geo)
        sd = mask_geo.boundary_signed_distance(geo.bnd_ab, d.xy)
        assert (sd > 0).mean() >= 0.99

    # every synthesized stop line's centre sits on the road
    for t in graph.traffic_lights:
        c = 0.5 * (t.stop_a + t.stop_b)
        sd = mask_geo.boundary_signed_distance(geo.bnd_ab, c[None, :])
        assert sd[0] > -0.5, f"stop line off road by {-sd[0]:.2f} m"


@needs_h5
def test_town01_bev_matches_reference_pixels():
    import h5py

    from gail_carla_tpu.config import EnvConfig
    from gail_carla_tpu.ops.bev import pixel_world_coords, render_bev
    from gail_carla_tpu.scene.town_import import make_town_scene

    sc = make_town_scene("Town01")
    cfg = EnvConfig()
    with h5py.File(os.path.join(H5_DIR, "Town01.h5"), "r") as f:
        off = np.asarray(f.attrs["world_offset_in_meters"], np.float64)
        road_tex = np.asarray(f["road"])
        lane_tex = np.asarray(f["lane_marking_all"])

    def host_warp(tex, xy, yaw):
        px = np.asarray(
            pixel_world_coords(
                cfg, jnp.asarray(xy, jnp.float32),
                jnp.asarray(yaw, jnp.float32),
            )
        )
        sx = np.round((px[:, 0] - off[0]) * 5.0).astype(int)
        sy = np.round((px[:, 1] - off[1]) * 5.0).astype(int)
        ok = (
            (sx >= 0) & (sx < tex.shape[1])
            & (sy >= 0) & (sy < tex.shape[0])
        )
        out = np.zeros(px.shape[0], tex.dtype)
        out[ok] = tex[sy[ok], sx[ok]]
        return out.reshape(cfg.bev_width, cfg.bev_width)

    road_ious, lane_ious = [], []
    for rid in range(3):
        n = int(sc.route_n[rid])
        for h in (30, min(300, n - 10)):
            xy = np.asarray(sc.route_xy[rid, h])
            yaw = float(sc.route_yaw[rid, h])
            img = np.asarray(
                render_bev(
                    sc, cfg, jnp.asarray(xy, jnp.float32),
                    jnp.asarray(yaw, jnp.float32),
                    jnp.int32(rid), jnp.int32(h),
                )
            )
            ref = host_warp(road_tex, xy, yaw) > 0
            ours = img[0] > 0.5
            road_ious.append(
                (ref & ours).sum() / max((ref | ours).sum(), 1)
            )
            ref_l = host_warp(lane_tex, xy, yaw) > 0
            ours_l = img[2] > 0
            lane_ious.append(
                (ref_l & ours_l).sum() / max((ref_l | ours_l).sum(), 1)
            )
    assert np.mean(road_ious) >= 0.995, road_ious
    assert np.min(road_ious) >= 0.99, road_ious
    assert np.mean(lane_ious) >= 0.90, lane_ious


def test_boundary_sign_robust_in_vertex_cones():
    """Regression (round-3 phantom violations): every point whose nearest
    boundary FEATURE is a shared vertex of two edges sits in a 2D cone
    where both edges are exactly equidistant — a plain argmin tie-breaks
    on fp noise and can flip the inside sign metres into plain road (a
    Town03 route point 7.65 m INSIDE the hard union measured -7.65). A
    diamond hole makes every interior diagonal a tie cone; host tests
    (points_inside / boundary_signed_distance) and the XLA op
    (ops/bev.py::boundary_inside) must all match the raw mask."""
    import jax.numpy as jnp

    from gail_carla_tpu.ops.bev import boundary_inside

    w = 160
    m = np.zeros((w, w), bool)
    m[10:150, 10:150] = True
    yy, xx = np.mgrid[:w, :w]
    m &= ~(np.abs(yy - 80) + np.abs(xx - 80) <= 25)   # diamond hole
    ppm = 2.0
    edges, dmax = mask_geo.mask_boundary_edges(m, np.zeros(2), ppm,
                                               max_err_px=0.2)
    # sample along the hole's diagonals (the tie cones) plus a fringe
    pts, truth = [], []
    rng = np.random.default_rng(0)
    for _ in range(400):
        px = rng.integers(12, 148, 2)
        # keep samples >1 px from the boundary so mask truth is exact
        d_h = np.abs(px[0] - 80) + np.abs(px[1] - 80)
        if 23 <= d_h <= 27:
            continue
        pts.append([(px[1] + 0.0) / ppm, (px[0] + 0.0) / ppm])
        truth.append(bool(m[px[0], px[1]]))
    pts = np.asarray(pts, np.float64)
    truth = np.asarray(truth)
    got = mask_geo.points_inside(edges, dmax, pts)
    assert (got == truth).all(), np.flatnonzero(got != truth)[:10]
    sd = mask_geo.boundary_signed_distance(edges, pts)
    assert ((sd > 0) == truth).all()
    dev = np.asarray(boundary_inside(
        jnp.asarray(pts, jnp.float32), jnp.asarray(edges, jnp.float32),
        dmax,
    ))
    assert (dev == truth).all(), np.flatnonzero(dev != truth)[:10]


def test_refine_polyline_inside_smooths_and_clears():
    """Elastic-band refinement (town-route final stage): a staircase path
    grazing a corridor wall comes back point-count-preserved, end-pinned,
    >= clearance inside the boundary, and smoother than it went in."""
    m = np.zeros((40, 120), bool)
    m[14:26, 4:116] = True          # 6 m tall corridor at ppm=2
    edges, _ = mask_geo.mask_boundary_edges(
        m, np.zeros(2), 2.0, max_err_px=0.2
    )
    # 1 m-step staircase hugging the top wall (y ~= 12.2 of wall 12.5)
    xs = np.arange(4.0, 56.0, 1.0)
    ys = 11.6 + 0.45 * (np.arange(len(xs)) % 2)
    xy = np.stack([xs, ys], axis=1)
    xy[:3, 1] = 9.5                 # frozen ends sit mid-corridor
    xy[-3:, 1] = 9.5
    out = mask_geo.refine_polyline_inside(edges, xy, clearance=0.75)
    assert out.shape == xy.shape
    np.testing.assert_allclose(out[:3], xy[:3])
    np.testing.assert_allclose(out[-3:], xy[-3:])
    sd = mask_geo.boundary_signed_distance(edges, out[3:-3])
    assert float(sd.min()) >= 0.6, float(sd.min())

    def max_turn(p):
        seg = np.diff(p, axis=0)
        g = np.linalg.norm(seg, axis=1) > 1e-9
        hdg = np.arctan2(seg[g][:, 1], seg[g][:, 0])
        return float(
            np.abs((np.diff(hdg) + np.pi) % (2 * np.pi) - np.pi).max()
        )

    assert max_turn(out) < 0.5 * max_turn(xy)


def test_refine_polyline_no_median_zigzag():
    """Regression (round-3 Town03 breakage): a path running mid-corridor
    past a thin median wall must NOT be teleported onto alternating lobes
    of the clearance line. The old hard-projection band put 89-178 deg
    zigzags, collapsed duplicates and multi-metre jumps into 16/20 Town03
    routes; the displacement-field band moves points coherently with a
    trust region, so the output stays on one side, kink-bounded, and at
    clearance."""
    m = np.zeros((60, 200), bool)
    m[10:50, 4:196] = True            # 20 m tall corridor at ppm=2
    m[28:32, 40:160] = False          # carve a median wall
    edges, _ = mask_geo.mask_boundary_edges(
        m, np.zeros(2), 2.0, max_err_px=0.2
    )
    # path drifts from below the median to just grazing it
    xs = np.arange(4.0, 96.0, 1.0)
    ys = np.full(len(xs), 12.0)
    ys[30:60] = 14.6                  # grazes the median (wall at y=14)
    xy = np.stack([xs, ys], axis=1)
    xy[:3, 1] = 12.0
    xy[-3:, 1] = 12.0
    out = mask_geo.refine_polyline_inside(edges, xy, clearance=0.75)
    assert out.shape == xy.shape
    # stays below the median throughout (no lobe teleport to y>16)
    assert float(out[:, 1].max()) < 14.5, float(out[:, 1].max())
    # no duplicate pile-ups, no multi-metre jumps
    step = np.linalg.norm(np.diff(out, axis=0), axis=1)
    assert float(step.min()) > 0.2 and float(step.max()) < 2.5, (
        float(step.min()), float(step.max()))
    # kink-bounded within the hero's steering envelope
    seg = np.diff(out, axis=0)
    hdg = np.arctan2(seg[:, 1], seg[:, 0])
    turn = np.abs((np.diff(hdg) + np.pi) % (2 * np.pi) - np.pi)
    assert float(np.degrees(turn.max())) < 30.0, float(
        np.degrees(turn.max()))
    # and the clearance goal is met
    sd = mask_geo.boundary_signed_distance(edges, out[3:-3])
    assert float(sd.min()) >= 0.6, float(sd.min())


@needs_h5
def test_hard_surface_union_spans_curb_to_wall():
    """The hard (curb-to-wall) collision surface is the
    road|shoulder|parking|sidewalk union: sidewalk points are OUTSIDE the
    road boundary but INSIDE the hard boundary (CARLA's collision sensor
    only fires on physical meshes past the pavement,
    criteria/collision.py:49-112)."""
    import h5py

    from gail_carla_tpu.scene.h5_maps import PPM, load_town_geometry

    geo = load_town_geometry("Town01")
    assert geo.hard_ab is not None and len(geo.hard_ab) > 100
    with h5py.File(os.path.join(H5_DIR, "Town01.h5"), "r") as f:
        off = np.asarray(f.attrs["world_offset_in_meters"], np.float64)
        road = np.asarray(f["road"]) > 0
        sidewalk = np.asarray(f["sidewalk"]) > 0
    # erode the sidewalk-only region one pixel so samples sit clear of
    # both boundaries, then sample a few hundred points
    only = sidewalk & ~road
    core = (
        only[1:-1, 1:-1] & only[:-2, 1:-1] & only[2:, 1:-1]
        & only[1:-1, :-2] & only[1:-1, 2:]
    )
    ys, xs = np.nonzero(core)
    sel = np.linspace(0, len(ys) - 1, 300).astype(int)
    pts = np.stack([xs[sel] + 1, ys[sel] + 1], 1) / PPM + off[None, :]
    sd_road = mask_geo.boundary_signed_distance(geo.bnd_ab, pts)
    sd_hard = mask_geo.boundary_signed_distance(geo.hard_ab, pts)
    assert (sd_road < 0).mean() > 0.98, (sd_road < 0).mean()
    assert (sd_hard > 0).mean() > 0.98, (sd_hard > 0).mean()


@needs_h5
def test_town_geometry_all_towns_load():
    from gail_carla_tpu.scene.h5_maps import (
        available_towns, load_town_geometry,
    )

    towns = available_towns()
    assert len(towns) == 6
    for t in towns:
        g = load_town_geometry(t)
        assert len(g.bnd_ab) > 100
        assert g.bnd_dmax > 3.0
        assert len(g.lane_ab) > 50
