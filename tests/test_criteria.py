import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene
from gail_carla_tpu.sim import criteria as crit
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.dynamics import DEFAULT_VEHICLE, VehicleState
from gail_carla_tpu.sim.env import reset_batch, step_batch


@pytest.fixture(scope="module")
def scene():
    return make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                min_length=150.0)


def test_light_phases_alternate(scene):
    assert scene.tl_n > 0
    t_axis = np.arange(0.0, signals.CYCLE_S, 0.5)
    states = np.stack(
        [np.asarray(signals.light_states(scene, t)) for t in t_axis]
    )
    g = np.asarray(scene.tl_group[: scene.tl_n])
    s = states[:, : scene.tl_n]
    # opposite groups are never green simultaneously at any sampled time
    for ti in range(len(t_axis)):
        greens = set(g[s[ti] == signals.GREEN])
        assert len(greens) <= 1
    # every light is green at some point and red at some point
    assert (s == signals.GREEN).any(axis=0).all()
    assert (s == signals.RED).any(axis=0).all()


def test_run_red_light_fires_once(scene):
    tl = 0
    a = np.asarray(scene.tl_stop[tl, 0])
    b = np.asarray(scene.tl_stop[tl, 1])
    yaw = float(scene.tl_yaw[tl])
    center = 0.5 * (a + b)
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    states = jnp.full((scene.tl_stop.shape[0],), signals.RED, jnp.int32)

    last = jnp.full((), -1, jnp.int32)
    cross = jnp.full((), -1, jnp.int32)
    fired = []
    # drive the tail across the stop line in 0.4 m steps
    for d in np.arange(-6.0, 6.0, 0.4):
        ego = VehicleState(
            xy=jnp.asarray(center + fwd * d),
            yaw=jnp.asarray(yaw), speed=jnp.asarray(5.0),
        )
        last, cross, ran = crit.run_red_light(
            scene, DEFAULT_VEHICLE, ego, states, last, cross
        )
        fired.append(bool(ran))
    assert sum(fired) == 1, f"expected exactly one crossing event: {fired}"

    # green light: never fires
    states_g = jnp.full_like(states, signals.GREEN)
    last = jnp.full((), -1, jnp.int32)
    cross = jnp.full((), -1, jnp.int32)
    for d in np.arange(-6.0, 6.0, 0.4):
        ego = VehicleState(
            xy=jnp.asarray(center + fwd * d),
            yaw=jnp.asarray(yaw), speed=jnp.asarray(5.0),
        )
        last, cross, ran = crit.run_red_light(
            scene, DEFAULT_VEHICLE, ego, states_g, last, cross
        )
        assert not bool(ran)


def test_red_light_junction_gate(scene):
    """One junction traversal scores at most one red, and a green entry
    immunises the junction's interior foreign stop lines (Town03-class
    geometry: a route through a big junction geometrically crosses other
    approaches' lines — CARLA's trigger volumes never cover the interior,
    traffic_light.py:113-156)."""
    ju = np.asarray(scene.tl_junction[: scene.tl_n])
    counts = {int(j): int((ju == j).sum()) for j in set(ju.tolist())}
    j = next(j for j, c in counts.items() if c >= 2)
    ids = np.nonzero(ju == j)[0][:2]
    t0, t1 = int(ids[0]), int(ids[1])
    states = jnp.full((scene.tl_stop.shape[0],), signals.RED, jnp.int32)

    def cross_line(tl, last, cross, states):
        a = np.asarray(scene.tl_stop[tl, 0])
        b = np.asarray(scene.tl_stop[tl, 1])
        yaw = float(scene.tl_yaw[tl])
        center = 0.5 * (a + b)
        fwd = np.array([np.cos(yaw), np.sin(yaw)])
        n = 0
        for d in np.arange(-6.0, 6.0, 0.4):
            ego = VehicleState(
                xy=jnp.asarray(center + fwd * d),
                yaw=jnp.asarray(yaw), speed=jnp.asarray(5.0),
            )
            last, cross, ran = crit.run_red_light(
                scene, DEFAULT_VEHICLE, ego, states, last, cross
            )
            n += int(bool(ran))
        return last, cross, n

    # both lines red, crossed back to back: only the first scores
    last = jnp.full((), -1, jnp.int32)
    cross = jnp.full((), -1, jnp.int32)
    last, cross, n0 = cross_line(t0, last, cross, states)
    last, cross, n1 = cross_line(t1, last, cross, states)
    assert n0 == 1 and n1 == 0, (n0, n1)

    # green entry at t0, red at t1: the traversal still scores nothing
    states_mixed = states.at[t0].set(signals.GREEN)
    last = jnp.full((), -1, jnp.int32)
    cross = jnp.full((), -1, jnp.int32)
    last, cross, n0 = cross_line(t0, last, cross, states_mixed)
    last, cross, n1 = cross_line(t1, last, cross, states_mixed)
    assert n0 == 0 and n1 == 0, (n0, n1)


def _drive_through_stop(scene, sign, speeds):
    center = np.asarray(scene.ss_center[sign])
    yaw = float(scene.ss_yaw[sign])
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    st = crit.StopSignState(
        jnp.full((), -1, jnp.int32), jnp.zeros((), bool),
        jnp.zeros((), bool),
    )
    events = {"encounter": 0, "run": 0}
    d = -22.0
    for speed in speeds:
        ego = VehicleState(
            xy=jnp.asarray(center + fwd * d),
            yaw=jnp.asarray(yaw), speed=jnp.asarray(speed),
        )
        route_pts = jnp.asarray(
            center[None, :] + fwd[None, :] * (d + 1 + np.arange(20))[:, None]
        )
        st, enc, ran = crit.run_stop_sign(
            scene, ego, route_pts, jnp.asarray(yaw), st
        )
        events["encounter"] += int(enc)
        events["run"] += int(ran)
        d += speed * 0.1
    return events


def test_stop_sign_run_and_comply(scene):
    assert scene.ss_n > 0
    # blow through at 6 m/s -> one encounter, one run event
    ev = _drive_through_stop(scene, 0, [6.0] * 120)
    assert ev["encounter"] == 1
    assert ev["run"] == 1
    # stop inside the influence zone -> no run event
    speeds = [6.0] * 30 + [0.0] * 20 + [6.0] * 100
    ev = _drive_through_stop(scene, 0, speeds)
    assert ev["encounter"] == 1
    assert ev["run"] == 0


def test_outside_and_wrong_lane(scene):
    from gail_carla_tpu.ops.bev import fetch_cell

    rid = jnp.zeros((), jnp.int32)
    xy = scene.route_xy[rid, 5]
    yaw = scene.route_yaw[rid, 5]
    road, flag, _, _, _ = fetch_cell(scene, xy)

    ego = VehicleState(xy=xy, yaw=yaw, speed=jnp.asarray(5.0))
    outside, wrong = crit.outside_route_lane(scene, ego, road, flag)
    assert not bool(outside) and not bool(wrong)

    # driving against the lane direction -> wrong lane
    ego_rev = VehicleState(
        xy=xy, yaw=yaw + jnp.pi, speed=jnp.asarray(5.0)
    )
    outside, wrong = crit.outside_route_lane(scene, ego_rev, road, flag)
    assert bool(wrong)

    # far off the road -> outside lane
    c, s = np.cos(float(yaw)), np.sin(float(yaw))
    off = np.asarray(xy) + np.array([-s, c]) * 12.0
    ego_off = VehicleState(
        xy=jnp.asarray(off), yaw=yaw, speed=jnp.asarray(5.0)
    )
    road2, flag2, _, _, _ = fetch_cell(scene, jnp.asarray(off))
    outside, wrong = crit.outside_route_lane(scene, ego_off, road2, flag2)
    assert bool(outside)


def test_valeo_terminal_stuck(scene):
    cfg = EnvConfig(train=False, terminal_mode="valeo", stuck_steps=30)
    states, _, _ = reset_batch(
        scene, cfg, jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32)
    )
    actions = jnp.zeros((1, 2))
    for i in range(60):
        states, out = step_batch(scene, cfg, states, actions)
        if bool(out.done[0]):
            assert float(out.info["terminal_reward"][0]) <= -1.0
            assert bool(out.info["exploration_suggest_go"][0])
            break
    else:
        pytest.fail("valeo stuck terminal never fired")


def test_episode_stats_in_info(scene):
    cfg = EnvConfig(train=False)
    states, _, _ = reset_batch(
        scene, cfg, jax.random.PRNGKey(1), jnp.zeros((1,), jnp.int32)
    )
    states, out = step_batch(scene, cfg, states,
                             jnp.tile(jnp.array([0.0, 0.5]), (1, 1)))
    for k in ("score_route", "score_penalty", "score_composed",
              "n_collisions_vehicle", "red_light_per_km"):
        assert k in out.info
    assert float(out.info["score_penalty"][0]) == 100.0  # no infractions yet
