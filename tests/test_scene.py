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
    assert sc.route_s_tex.shape == (2,) + sc.road_tex.shape
    assert int(sc.route_n[0]) <= L
    # route points lie on road texture
    n = int(sc.route_n[0])
    pts = np.asarray(sc.route_xy[0, :n])
    px = ((pts - np.asarray(sc.world_offset)) * sc.ppm).astype(int)
    road = np.asarray(sc.road_tex)
    hit = road[px[:, 1], px[:, 0]]
    assert (hit == 255).mean() > 0.99
    # arc-length texture at route points matches route_s
    stex = np.asarray(sc.route_s_tex[0])
    vals = stex[px[:, 1], px[:, 0]].astype(np.float64)
    s = np.asarray(sc.route_s[0, :n])
    ok = vals > 0
    assert ok.mean() > 0.95
    np.testing.assert_allclose(
        (vals[ok] - 1) * 0.25, s[ok], atol=3.0
    )


def test_benchmark_scene_builds_and_caches():
    s1 = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                              min_length=150.0)
    s2 = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                              min_length=150.0)
    assert s1 is s2
    assert s1.n_routes == 2
