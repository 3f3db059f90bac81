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


def test_graph_merges_shared_roads(town01_routes, town01_graph):
    g = town01_graph
    assert len(g.edges) > 50
    total_lane_m = sum(e.length for e in g.edges)
    total_route_m = sum(
        densify_route(r.waypoints).length_m for r in town01_routes
    )
    # routes heavily share roads; the merged graph must be much smaller
    # than the raw union of route polylines
    assert total_lane_m < 0.8 * total_route_m
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
