"""Reconstructed reference towns (scene/town_import.py).

Covers VERDICT round-1 item #2: the reference's actual benchmark —
Town01 + routes_training.xml routes 0-9 (``params_variable.json:13``,
``leaderboard_env.py:7-97``) — must run end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.town_import import (
    benchmark_routes,
    build_town_graph,
    collect_town_routes,
    densify_route,
    make_town_scene,
)


@pytest.fixture(scope="module")
def town01_routes():
    return benchmark_routes("Town01")


@pytest.fixture(scope="module")
def town01_graph(town01_routes):
    return build_town_graph(collect_town_routes("Town01"))


@pytest.fixture(scope="module")
def town01_scene():
    return make_town_scene("Town01")


def test_benchmark_routes_are_the_training_pack(town01_routes):
    # routes 0-9 of routes_training.xml are the Town01 block
    assert len(town01_routes) == 10
    assert [r.route_id for r in town01_routes] == list(range(10))
    assert all(r.town == "Town01" for r in town01_routes)
    # first waypoint of route 0, verbatim from the reference XML
    np.testing.assert_allclose(
        town01_routes[0].waypoints[0, :2],
        [338.7027893066406, 226.75003051757812],
    )


def test_densified_routes_pass_through_every_waypoint(town01_routes):
    for r in town01_routes:
        d = densify_route(r.waypoints)
        # ~1 m sampling, monotonic arc length
        assert np.all(np.diff(d.s) > 0)
        assert np.median(np.diff(d.s)) < 1.5
        for wp in r.waypoints:
            dist = np.linalg.norm(d.xy - wp[None, :2], axis=1).min()
            assert dist < 1.5, f"route {r.route_id} misses waypoint {wp}"


def test_graph_merges_shared_roads(town01_graph):
    g = town01_graph
    assert len(g.edges) > 50
    total_lane_m = sum(e.length for e in g.edges)
    evidence_m = sum(
        densify_route(r.waypoints).length_m
        for r in collect_town_routes("Town01")
    )
    # the 22 evidence routes heavily share roads; the merged graph must be
    # much smaller than their raw union even though junction COMPLETION
    # (build_town_graph step 4b) adds connectors the evidence never drove
    assert total_lane_m < 0.6 * evidence_m
    # both travel directions reconstructed somewhere
    dirs = [e.pts[-1] - e.pts[0] for e in g.edges if not e.is_junction]
    xs = np.array([d[0] for d in dirs])
    assert (xs > 1).any() and (xs < -1).any()


def test_synthesized_signals(town01_graph):
    g = town01_graph
    assert len(g.traffic_lights) >= 20     # Town01 is fully signalized
    for t in g.traffic_lights:
        assert t.group in (0, 1)
        # stop line spans roughly one lane width
        span = np.linalg.norm(t.stop_b - t.stop_a)
        assert 2.0 < span < 6.0
    # at least one junction has lights on 2+ approach groups
    import collections

    by_junction = collections.defaultdict(set)
    for t in g.traffic_lights:
        by_junction[t.junction].add(t.group)
    assert any(len(gs) == 2 for gs in by_junction.values())


def test_town_scene_builds(town01_scene):
    s = town01_scene
    assert s.n_routes == 10
    assert int(s.route_n.max()) <= s.route_xy.shape[1]
    assert s.tl_n >= 20
    assert s.spawn.shape[0] > 10
    # route lengths match the reference geometry scale (0.5-1.3 km)
    lens = np.asarray(s.route_len_m)
    assert lens.min() > 400 and lens.max() < 1400


def test_other_towns_reconstruct():
    for town, f in (("Town02", "routes_testing.xml"),
                    ("Town03", "routes_training.xml")):
        s = make_town_scene(town, f)
        assert s.n_routes > 0
        assert int(s.route_n.max()) <= s.route_xy.shape[1]


@pytest.mark.slow
def test_changelane_in_reconstructed_towns():
    """VERDICT r2 next-step #3: multi-lane reconstructed towns must carry
    CHANGELANE edges (``global_route_planner.py:148-184`` lane-change
    semantics) so commands 5/6 occur off the procedural grid town —
    both in the shipped benchmark routes (densified evidence legs of
    lane-change shape) and in graph-planned routes."""
    import collections
    import math

    from gail_carla_tpu.scene.h5_maps import load_town_geometry
    from gail_carla_tpu.scene.road_option import RoadOption
    from gail_carla_tpu.scene.trace import trace_route

    LC = (RoadOption.CHANGELANELEFT, RoadOption.CHANGELANERIGHT)
    geo = load_town_geometry("Town04")
    g = build_town_graph(collect_town_routes("Town04"), geometry=geo)
    lc_edges = [e for e in g.edges if e.option in LC]
    assert len(lc_edges) > 50   # highway town: both evidence blends and
    #                             synthesized adjacent-lane connectors

    # (a) the shipped benchmark routes carry lane-change legs -> cmd 5/6
    #     appears in their dense routes
    n_lc_pts = sum(
        int(np.isin(densify_route(r.waypoints).cmd, [5, 6]).sum())
        for r in benchmark_routes("Town04")
    )
    assert n_lc_pts > 20

    # (b) planning THROUGH the graph from a source-lane point to an
    #     adjacent-target-lane point emits CHANGELANE commands
    by_dst = collections.defaultdict(list)
    by_src = collections.defaultdict(list)
    for k, e in enumerate(g.edges):
        if e.option not in LC:
            by_dst[e.dst].append(k)
            by_src[e.src].append(k)
    planned = with_lc = 0
    for e in g.edges:
        if e.option not in LC:
            continue
        ups = [g.edges[k] for k in by_dst[e.src]]
        dns = [g.edges[k] for k in by_src[e.dst]]
        if not ups or not dns:
            continue
        u, dn = ups[0], dns[0]
        pa = u.pts[len(u.pts) // 2]
        pb = dn.pts[len(dn.pts) // 2]
        ya = math.atan2(*(u.pts[-1] - u.pts[0])[::-1])
        yb = math.atan2(*(dn.pts[-1] - dn.pts[0])[::-1])
        d = trace_route(
            g, np.array([[pa[0], pa[1], ya], [pb[0], pb[1], yb]]),
            use_yaw=True,
        )
        planned += 1
        with_lc += int(np.isin(d.cmd, [5, 6]).any())
        if planned >= 20:
            break
    assert planned == 20            # every such pair must be plannable
    assert with_lc >= 15            # and nearly all use a lane change

    # Town01/02 are single-lane towns: NO lane-change edges may appear
    for town in ("Town01", "Town02"):
        g1 = build_town_graph(
            collect_town_routes(town), geometry=load_town_geometry(town),
            crossing_junctions=True,
        )
        assert not any(e.option in LC for e in g1.edges)


@pytest.mark.slow
def test_nocrash_pack_runs_on_real_town02():
    """VERDICT r2 next-step #4: the shipped NoCrash route pack (bare
    start/goal pairs, nocrash_env.py:57-59) must plan through the
    completed Town02 lane graph and run as an env suite with the
    reference's per-town traffic densities."""
    from gail_carla_tpu.envs.suites import nocrash_suite
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    scene, cfg, tasks = nocrash_suite(
        town="Town02", background_traffic="regular",
        weather_group="train_eval",
    )
    # 25 pack routes; at most one unplannable corner case may drop
    assert scene.n_routes >= 24
    # nocrash_env.py:38-46 Town02 regular: 15 vehicles, 50 walkers (full
    # reference densities — the r3 32-per-kind cap is gone)
    assert cfg.n_npc_vehicles == 15 and cfg.n_npc_walkers == 50
    assert len(tasks) == 2 * scene.n_routes  # train_eval = 2 weathers
    # routes live on the real town (Town02 spans roughly x:[-10,200])
    lens = np.asarray(scene.route_len_m)[: scene.n_routes]
    assert lens.min() > 100.0
    # smoke: env steps with traffic on a pack route
    states, metrics, render = reset_batch(
        scene, cfg, jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32)
    )
    for _ in range(5):
        states, out = step_batch(
            scene, cfg, states, jnp.tile(jnp.array([0.0, 0.6]), (2, 1))
        )
    assert np.isfinite(np.asarray(out.reward)).all()


@pytest.mark.slow
def test_completed_graph_stays_on_mask():
    """Graph completion (twins / junction connectors / extensions) must
    not invent off-road lanes: every edge polyline point of the completed
    Town02 graph sits inside the H5 road mask after repair."""
    from gail_carla_tpu.scene import mask_geo
    from gail_carla_tpu.scene.h5_maps import load_town_geometry
    from gail_carla_tpu.scene.town_import import (
        build_town_graph, collect_town_routes, repair_graph_to_mask,
    )

    geo = load_town_geometry("Town02")
    graph = build_town_graph(
        collect_town_routes("Town02"), geometry=geo,
        crossing_junctions=True,
    )
    graph = repair_graph_to_mask(graph, geo)
    pts = np.concatenate([e.pts for e in graph.edges], axis=0)
    _, sd, _ = mask_geo.boundary_project(geo.bnd_ab, pts)
    on_road = (sd > 0.0).mean()
    assert on_road >= 0.99, f"only {on_road:.1%} of graph points on-road"


def test_expert_completes_town01_route(town01_scene):
    """The compliant on-device expert drives reference route 0 to
    completion (the reference's expert loop runs until route_completed,
    carla_exp.py:50)."""
    from gail_carla_tpu.agents.autopilot import autopilot_act, make_autopilot
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    scene = town01_scene
    cfg = EnvConfig(train=False, obs_mode="state")
    rids = jnp.asarray([0], jnp.int32)
    states, metrics, render = reset_batch(
        scene, cfg, jax.random.PRNGKey(0), rids
    )
    ap = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (1,) + np.shape(a)), make_autopilot()
    )

    @jax.jit
    def run(states, metrics, ap):
        def body(carry, _):
            st, met, ap, latched = carry
            ap2, act = jax.vmap(
                lambda a, w: autopilot_act(scene, a, w, obey_signals=True)
            )(ap, st)
            st2, out = step_batch(scene, cfg, st, act)
            first = out.done & (~latched["done"])
            latched = {
                "done": latched["done"] | out.done,
                "completed": jnp.where(
                    first, out.info["route_completed"], latched["completed"]
                ),
                "score": jnp.where(
                    first, out.info["score_composed"], latched["score"]
                ),
            }
            return (st2, out.metrics, ap2, latched), None

        l0 = {
            "done": jnp.zeros((1,), bool),
            "completed": jnp.zeros((1,), bool),
            "score": jnp.zeros((1,)),
        }
        (_, _, _, latched), _ = jax.lax.scan(
            body, (states, metrics, ap, l0), None, length=1700
        )
        return latched

    out = jax.tree.map(np.asarray, run(states, metrics, ap))
    assert bool(out["completed"][0])
    assert float(out["score"][0]) > 90.0


def test_plan_on_mask_routes_around_gaps():
    """mask_geo.plan_on_mask: A* on the road mask connects points whose
    straight chord crosses off-road ground, staying on the mask."""
    from gail_carla_tpu.scene import mask_geo

    ppm, w = 5.0, 300
    mask = np.zeros((w, w), bool)
    mask[20:260, 20:40] = True     # left arm (x ~ 4..8 m)
    mask[240:260, 20:260] = True   # bottom bar
    mask[20:260, 240:260] = True   # right arm
    off = np.zeros(2)
    a = np.array([6.0, 5.0])       # top of left arm
    b = np.array([50.0, 5.0])      # top of right arm
    path = mask_geo.plan_on_mask(mask, off, ppm, a, b)
    assert path is not None
    # every path point on the mask (within a smoothing tolerance cell)
    xi = np.clip((path[:, 0] * ppm).round().astype(int), 0, w - 1)
    yi = np.clip((path[:, 1] * ppm).round().astype(int), 0, w - 1)
    frac_on = mask[yi, xi].mean()
    assert frac_on > 0.95, frac_on
    assert np.linalg.norm(path[0] - a) < 1e-6
    assert np.linalg.norm(path[-1] - b) < 1e-6
    # it went around: path length ~ 100 m, not the 44 m chord
    length = np.linalg.norm(np.diff(path, axis=0), axis=1).sum()
    assert length > 80.0

    # disconnected masks yield None
    mask2 = np.zeros((w, w), bool)
    mask2[20:260, 20:40] = True
    mask2[20:260, 240:260] = True
    assert mask_geo.plan_on_mask(mask2, off, ppm, a, b) is None


# Every reference town with a shipped route pack, and the pack that holds
# its block (routes_training/testing.xml — leaderboard_env.py:7-97 spans
# Town01-06). These parameterize the three scene-fidelity gates below to
# Town01-grade for ALL towns (VERDICT r3 next-step #3).
ALL_TOWN_PACKS = [
    ("Town01", "routes_training.xml"),
    ("Town02", "routes_testing.xml"),
    ("Town03", "routes_training.xml"),
    ("Town04", "routes_training.xml"),
    ("Town05", "routes_testing.xml"),
    ("Town06", "routes_training.xml"),
]


@pytest.mark.slow
@pytest.mark.parametrize("town,pack", ALL_TOWN_PACKS,
                         ids=[t for t, _ in ALL_TOWN_PACKS])
def test_benchmark_routes_stay_on_road(town, pack):
    """Every benchmark route point either stays within 3 m of the H5 road
    mask or sits SOLIDLY (>= 0.5 m) on the hard drivable union — a
    sidewalk/parking detour costs OutsideRouteLane percentage
    (outside_route_lane.py), it is not a ghost route through nothing.
    Round-3 fix context: Town03 routes used to keep 20-38 m off-road
    excursions; one route's only drivable repair around an un-plannable
    building span is a legal pavement detour 3.6 m off the road mask."""
    from gail_carla_tpu.scene import mask_geo
    from gail_carla_tpu.scene.h5_maps import load_town_geometry

    sc = make_town_scene(town, pack)
    geo = load_town_geometry(town)
    for rid in range(int(sc.n_routes)):
        n = int(sc.route_n[rid])
        xy = np.asarray(sc.route_xy[rid, :n], np.float64)
        sd_r = mask_geo.boundary_signed_distance(geo.bnd_ab, xy)
        sd_h = mask_geo.boundary_signed_distance(geo.hard_ab, xy)
        bad = (sd_r <= -3.0) & (sd_h < 0.5)
        assert not bad.any(), (
            f"{town} route {rid}: {int(bad.sum())} points "
            f"{-float(sd_r[bad].min()):.1f} m off-road and not on the "
            "hard surface"
        )


@pytest.mark.slow
@pytest.mark.parametrize("town,pack", ALL_TOWN_PACKS,
                         ids=[t for t, _ in ALL_TOWN_PACKS])
def test_benchmark_routes_clear_hard_surface(town, pack):
    """No benchmark route pose would fire a layout collision: the sim's
    static_collision (sim/collisions.py:40-60, matching CARLA's
    mesh-contact sensor, collision.py:49-112) fires only when ALL FOUR
    body corners leave the hard (curb-to-wall) union. The gate asserts,
    at every route pose, that the BEST corner — with every half-extent
    INFLATED by 0.3 m, which is where the expert-tracking safety margin
    lives — stays strictly inside, and that no route point sits deeper
    than 2.0 m outside. Narrow-void crossings (thin painted/grass
    medians between carriageways, which carry no collidable mesh) are
    legal because the body bridges them; a blunt per-point clearance
    assert wrongly failed those while missing nothing real."""
    from gail_carla_tpu.scene import mask_geo
    from gail_carla_tpu.scene.h5_maps import load_town_geometry

    sc = make_town_scene(town, pack)
    geo = load_town_geometry(town)
    HL, HW = 2.7, 1.3     # VehicleParams half extents + 0.3 m margin
    for rid in range(int(sc.n_routes)):
        n = int(sc.route_n[rid])
        xy = np.asarray(sc.route_xy[rid, :n], np.float64)
        yaw = np.asarray(sc.route_yaw[rid, :n], np.float64)
        f = np.stack([np.cos(yaw), np.sin(yaw)], 1)
        lt = np.stack([-np.sin(yaw), np.cos(yaw)], 1)
        corners = np.concatenate(
            [xy + a * HL * f + b * HW * lt
             for a in (1, -1) for b in (1, -1)], axis=0,
        )
        sd_c = mask_geo.boundary_signed_distance(
            geo.hard_ab, corners
        ).reshape(4, n)
        best_corner = float(sd_c.max(axis=0).min())
        assert best_corner > 0.0, (
            f"{town} route {rid}: a pose's best inflated corner is "
            f"{best_corner:.2f} m outside the hard surface (layout "
            "collision)"
        )
        sd = mask_geo.boundary_signed_distance(geo.hard_ab, xy)
        assert float(sd.min()) >= -2.0, (
            f"{town} route {rid} runs {-float(sd.min()):.2f} m outside "
            "the hard surface"
        )


def test_uturn_teardrop_is_drivable():
    """Anti-parallel waypoint pairs (Town03 median U-turns, e.g.
    routes_training.xml (197.6,58.8)->(197.6,62.1)) densify into a Dubins
    teardrop: correct endpoints/headings and curvature within the hero
    vehicle's steering envelope (min radius ~4.2 m, sim/dynamics.py:46-48)
    — NOT a sub-metre hairpin."""
    import math

    from gail_carla_tpu.scene.town import _sample_uturn
    from gail_carla_tpu.scene.town_import import densify_leg

    p0 = np.array([197.6, 58.8])
    p1 = np.array([197.6, 62.1])
    pts = _sample_uturn(p0, math.pi, p1, 0.0)
    assert np.allclose(pts[0], p0) and np.allclose(pts[-1], p1, atol=0.2)
    seg = np.diff(pts, axis=0)
    good = np.linalg.norm(seg, axis=1) > 1e-6
    hdg = np.arctan2(seg[good][:, 1], seg[good][:, 0])
    turn = np.abs((np.diff(hdg) + np.pi) % (2 * np.pi) - np.pi)
    # 1 m steps on an r=4.6 circle bend ~12.5 deg/pt; hairpins were ~170
    assert float(np.degrees(turn.max())) < 16.0
    assert abs((hdg[0] - math.pi + math.pi) % (2 * math.pi) - math.pi) < 0.2
    # densify_leg routes U-turn legs through the teardrop path
    pieces = densify_leg(p0, math.pi, p1, 0.0)
    assert len(pieces) == 1
    assert len(pieces[0].pts) > 20  # teardrop ~30 m, hairpin was ~4 pts


@pytest.mark.slow
@pytest.mark.parametrize("town,pack", ALL_TOWN_PACKS,
                         ids=[t for t, _ in ALL_TOWN_PACKS])
def test_benchmark_routes_have_no_hairpins(town, pack):
    """No dense benchmark route of any town bends beyond the steering
    envelope between ~1 m samples (the pre-round-3 hairpin U-turns spun
    the expert off-road on Town03 routes 3/8/9/16/17)."""
    sc = make_town_scene(town, pack)
    for rid in range(int(sc.n_routes)):
        n = int(sc.route_n[rid])
        xy = np.asarray(sc.route_xy[rid, :n], np.float64)
        seg = np.diff(xy, axis=0)
        good = np.linalg.norm(seg, axis=1) > 1e-6
        hdg = np.arctan2(seg[good][:, 1], seg[good][:, 0])
        turn = np.abs((np.diff(hdg) + np.pi) % (2 * np.pi) - np.pi)
        assert float(np.degrees(turn.max())) < 45.0, (
            f"{town} route {rid}: "
            f"{float(np.degrees(turn.max())):.0f} deg kink"
        )


@pytest.mark.slow
def test_corl2017_pack_runs_on_real_town01():
    """CoRL2017 on the reconstructed town (corl2017_env.py:28-46): the
    shipped per-shape packs plan through the completed Town01 lane
    graph; navigation_dynamic applies the reference traffic densities
    (20 vehicles / 50 walkers, corl2017_env.py:47-56, uncapped)."""
    from gail_carla_tpu.envs.suites import corl2017_suite
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    scene, cfg, tasks = corl2017_suite(
        task_type="straight", town="Town01", weather_group="train",
    )
    assert scene.n_routes >= 24          # 25-pair pack, <=1 corner drop
    assert cfg.n_npc_vehicles == 0       # static tasks have no traffic
    lens = np.asarray(scene.route_len_m)[: scene.n_routes]
    assert lens.min() > 20.0             # Straight pairs are short legs

    scene_d, cfg_d, _ = corl2017_suite(
        task_type="navigation_dynamic", town="Town01",
    )
    assert cfg_d.n_npc_vehicles == 20 and cfg_d.n_npc_walkers == 50
    lens_d = np.asarray(scene_d.route_len_m)[: scene_d.n_routes]
    assert lens_d.min() > 100.0          # Navigation pairs cross town

    states, _, _ = reset_batch(
        scene_d, cfg_d, jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32)
    )
    for _ in range(5):
        states, out = step_batch(
            scene_d, cfg_d, states,
            jnp.tile(jnp.array([0.0, 0.6]), (2, 1)),
        )
    assert np.isfinite(np.asarray(out.reward)).all()


def test_scene_disk_cache_roundtrip(town01_scene, tmp_path):
    """Scenes reloaded from the disk cache must behave exactly like
    freshly built ones: pickle stores host numpy leaves (device_get at
    save), so the loader has to restore jnp arrays — a numpy route_n
    indexed by a vmap tracer raises TracerArrayConversionError."""
    from gail_carla_tpu.scene.town_import import (
        _scene_cache_load,
        _scene_cache_save,
    )

    path = str(tmp_path / "scene.pkl")
    _scene_cache_save(path, town01_scene)
    loaded = _scene_cache_load(path)
    assert loaded is not None

    for fresh_leaf, cached_leaf in zip(
        jax.tree_util.tree_leaves(town01_scene),
        jax.tree_util.tree_leaves(loaded),
    ):
        assert isinstance(cached_leaf, jnp.ndarray)
        np.testing.assert_array_equal(
            np.asarray(fresh_leaf), np.asarray(cached_leaf)
        )

    # the exact failure mode: traced per-env route indexing under vmap
    picked = jax.vmap(lambda i: loaded.route_n[i])(jnp.arange(4))
    np.testing.assert_array_equal(
        np.asarray(picked), np.asarray(town01_scene.route_n)[:4]
    )
