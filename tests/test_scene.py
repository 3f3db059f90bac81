import numpy as np
import pytest

from gail_carla_tpu.scene.road_option import RoadOption
from gail_carla_tpu.scene.routes import (
    RouteDef, generate_routes, parse_routes_xml, write_routes_xml,
)
from gail_carla_tpu.scene.scene import build_scene, make_benchmark_scene
from gail_carla_tpu.scene.town import astar, make_grid_town, nearest_edge_point
from gail_carla_tpu.scene.trace import trace_route


@pytest.fixture(scope="module")
def town():
    return make_grid_town(nx=3, ny=3, block=80.0)


def test_grid_town_structure(town):
    assert len(town.edges) > 0
    assert len(town.nodes) == 3 * 3 * 4 * 2
    # every straight lane should be ~block - 2*margin long
    straight = [e for e in town.edges if not e.is_junction]
    for e in straight[:5]:
        assert 60.0 <= e.length <= 66.0
    assert len(town.traffic_lights) > 0
    assert len(town.stop_signs) > 0


def test_astar_connects_far_corners(town):
    a, _ = nearest_edge_point(town, np.array([0.0, 0.0]))
    b, _ = nearest_edge_point(town, np.array([160.0, 160.0]))
    path = astar(town, town.edges[a].dst, town.edges[b].src)
    assert path is not None


def test_trace_route_density_and_commands(town):
    wps = np.array([[5.0, 1.75, 0.0], [160.0, 81.75, 0.0]])
    d = trace_route(town, wps)
    gaps = np.linalg.norm(np.diff(d.xy, axis=0), axis=1)
    assert gaps.max() < 2.0  # ~1 m resolution like GlobalRoutePlanner
    assert gaps.min() > 1e-6
    assert d.length_m > 200.0
    # A route across the grid must contain at least one turn command.
    assert np.any(np.isin(d.cmd, [int(RoadOption.LEFT), int(RoadOption.RIGHT)]))
    # s is strictly increasing and consistent with point spacing.
    np.testing.assert_allclose(np.diff(d.s), gaps, rtol=1e-6)
    # plan is much sparser than the dense trace but covers it
    assert 2 <= len(d.plan_xy) < len(d.xy) / 5


def test_routes_xml_roundtrip(town, tmp_path):
    routes = generate_routes(town, n_routes=3, min_length=150.0, seed=7)
    p = tmp_path / "routes.xml"
    write_routes_xml(routes, str(p))
    parsed = parse_routes_xml(str(p))
    assert len(parsed) == 3
    np.testing.assert_allclose(
        parsed[1].waypoints, routes[1].waypoints, atol=1e-5
    )


def test_build_scene_shapes(town):
    routes = generate_routes(town, n_routes=2, min_length=150.0, seed=3)
    sc = build_scene(town, routes)
    R, L, _ = sc.route_xy.shape
    assert R == 2
    n = int(sc.route_n[0])
    assert n <= L - 84  # headroom for dynamic_slice route windows

    # every route point must lie on the road: within half_lane of some road
    # capsule in its spatial-hash cell
    pts = np.asarray(sc.route_xy[0, :n])
    cell = np.floor(
        (pts - np.asarray(sc.cell_grid_lo)[None]) / sc.cell_size
    ).astype(int)
    road = np.asarray(sc.cell_road)
    on_road = np.zeros(n, bool)
    for i in range(n):
        segs = road[cell[i, 1], cell[i, 0]]
        a, b = segs[:, :2], segs[:, 2:]
        ab = b - a
        t = np.clip(
            np.sum((pts[i] - a) * ab, -1)
            / (np.sum(ab * ab, -1) + 1e-9), 0, 1,
        )
        d = np.linalg.norm(pts[i] - (a + t[:, None] * ab), axis=-1)
        on_road[i] = d.min() <= sc.half_lane + 0.05
    assert on_road.mean() > 0.99

    # lane tables carry both marking values
    vals = np.unique(np.asarray(sc.cell_lane_val))
    assert 255.0 in vals and 120.0 in vals

    # procedural towns have no curb-to-wall layers: the hard (collision)
    # boundary aliases the road boundary exactly
    assert sc.cell_hard.shape == sc.cell_bnd.shape
    np.testing.assert_array_equal(
        np.asarray(sc.cell_hard), np.asarray(sc.cell_bnd)
    )
    np.testing.assert_array_equal(
        np.asarray(sc.cell_hard_n), np.asarray(sc.cell_bnd_n)
    )
    assert sc.hard_dmax == sc.bnd_dmax


def test_benchmark_scene_builds_and_caches():
    s1 = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                              min_length=150.0)
    s2 = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                              min_length=150.0)
    assert s1 is s2
    assert s1.n_routes == 2
