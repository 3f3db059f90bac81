import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene
from gail_carla_tpu.sim.env import reset_batch, step_batch


@pytest.fixture(scope="module")
def scene():
    return make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                min_length=150.0)


def _capsule_min_dist(scene, pts):
    """host-side: distance from points to nearest road capsule centreline."""
    import numpy as np

    road = np.asarray(scene.cell_road)
    lo = np.asarray(scene.cell_grid_lo)
    out = []
    for p in pts:
        cy, cx = int((p[1] - lo[1]) // scene.cell_size), int(
            (p[0] - lo[0]) // scene.cell_size
        )
        segs = road[cy, cx]
        a, b = segs[:, :2], segs[:, 2:]
        ab = b - a
        t = np.clip(
            np.sum((p - a) * ab, -1) / (np.sum(ab * ab, -1) + 1e-9), 0, 1
        )
        out.append(np.linalg.norm(p - (a + t[:, None] * ab), axis=-1).min())
    return np.array(out)


def test_npcs_drive_lanes_and_walkers_move(scene):
    cfg = EnvConfig(train=False, n_npc_vehicles=8, n_npc_walkers=4)
    states, _, _ = reset_batch(
        scene, cfg, jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32)
    )
    npc0 = np.asarray(states.traffic.veh.xy)
    w0 = np.asarray(states.traffic.walker_xy)
    # spawn distance from ego >= 10 m
    ego0 = np.asarray(states.ego.xy)
    d = np.linalg.norm(npc0 - ego0[:, None, :], axis=-1)
    assert (d >= 10.0).all()

    actions = jnp.tile(jnp.array([0.0, 0.4]), (2, 1))
    for _ in range(100):  # 10 s
        states, out = step_batch(scene, cfg, states, actions)
    npc1 = np.asarray(states.traffic.veh.xy)
    w1 = np.asarray(states.traffic.walker_xy)

    moved = np.linalg.norm(npc1 - npc0, axis=-1)
    assert (moved.max(axis=1) > 10.0).all(), "no NPC moved"
    assert (np.linalg.norm(w1 - w0, axis=-1).max(axis=1) > 3.0).all()

    # NPCs stay on the road (within half-lane + slack of a road capsule)
    dmin = _capsule_min_dist(scene, npc1.reshape(-1, 2))
    assert (dmin < scene.half_lane + 0.8).mean() > 0.9, dmin

    # NPC speeds bounded by their target speeds
    assert np.asarray(states.traffic.veh.speed).max() < 10.0


def test_walkers_keep_to_sidewalks(scene):
    """VERDICT #7: walkers follow the pavement band (lane half-width +
    SIDEWALK_OFFSET off the lane centreline) instead of roaming the road;
    reference walkers stay on navmesh sidewalks
    (zombie_walker_handler.py:7-98)."""
    from gail_carla_tpu.sim.traffic import SIDEWALK_OFFSET

    cfg = EnvConfig(train=False, n_npc_vehicles=0, n_npc_walkers=8)
    states, _, _ = reset_batch(
        scene, cfg, jax.random.PRNGKey(1), jnp.zeros((2,), jnp.int32)
    )
    actions = jnp.zeros((2, 2))
    samples = []
    for _ in range(60):
        states, _ = step_batch(scene, cfg, states, actions)
        samples.append(np.asarray(states.traffic.walker_xy).reshape(-1, 2))
    pts = np.concatenate(samples, axis=0)
    dmin = _capsule_min_dist(scene, pts)
    off_road = dmin > scene.half_lane
    near_band = dmin < scene.half_lane + SIDEWALK_OFFSET + 1.5
    # crossings are rare (CROSS_EVERY_S), so the vast majority of samples
    # sit in the sidewalk band
    assert off_road.mean() > 0.8, dmin
    assert near_band.mean() > 0.9, dmin


def test_ego_collides_with_npc(scene):
    """Teleport-free check: drive the ego into a spot occupied by an NPC by
    making NPCs static obstacles (target speed ~0 via no patrol advance is
    hard to force, so instead verify the OBB test directly through info)."""
    from gail_carla_tpu.sim.collisions import dynamic_collisions
    from gail_carla_tpu.sim.dynamics import DEFAULT_VEHICLE, VehicleState
    from gail_carla_tpu.sim.state import make_empty_traffic

    t = make_empty_traffic(1, 1)
    t = t.replace(
        veh=VehicleState(
            xy=jnp.asarray([[3.0, 0.5]]), yaw=jnp.asarray([0.2]),
            speed=jnp.zeros((1,)),
        ),
        walker_xy=jnp.asarray([[100.0, 100.0]]),
    )
    ego = VehicleState(
        xy=jnp.asarray([0.0, 0.0]), yaw=jnp.asarray(0.0),
        speed=jnp.asarray(5.0),
    )
    hits = dynamic_collisions(t, DEFAULT_VEHICLE, ego)
    assert bool(hits.veh) and not bool(hits.ped)
    assert int(hits.veh_id) == 0
    assert float(hits.veh_rel_speed) == pytest.approx(5.0, abs=0.01)

    # walker under the bumper
    t2 = t.replace(
        veh=VehicleState(
            xy=jnp.asarray([[50.0, 50.0]]), yaw=jnp.asarray([0.0]),
            speed=jnp.zeros((1,)),
        ),
        walker_xy=jnp.asarray([[1.5, 0.0]]),
    )
    hits = dynamic_collisions(t2, DEFAULT_VEHICLE, ego)
    assert bool(hits.ped) and not bool(hits.veh)

    # nothing nearby
    t3 = t2.replace(walker_xy=jnp.asarray([[50.0, 0.0]]))
    hits = dynamic_collisions(t3, DEFAULT_VEHICLE, ego)
    assert not bool(hits.veh) and not bool(hits.ped)


def test_collision_event_dedup():
    """criteria/collision.py:27-62: sustained/nearby contact registers ONE
    event; the location is forgotten 5 m away; the same actor id is ignored
    for 5 s."""
    from gail_carla_tpu.sim.collisions import DynHits, dedup_events
    from gail_carla_tpu.sim.dynamics import VehicleState

    def mk_hits(veh=False):
        return DynHits(
            veh=jnp.asarray(veh), ped=jnp.asarray(False),
            veh_id=jnp.zeros((), jnp.int32), ped_id=jnp.zeros((), jnp.int32),
            veh_rel_speed=jnp.asarray(3.0), ped_rel_speed=jnp.asarray(0.0),
        )

    ego = VehicleState(xy=jnp.asarray([0.0, 0.0]), yaw=jnp.zeros(()),
                       speed=jnp.asarray(2.0))
    mem = (jnp.full((2,), 1e9), jnp.full((), -1e9),
           jnp.full((), -1, jnp.int32))

    # first contact -> event
    ev = dedup_events(ego, jnp.asarray(1.0), jnp.asarray(False),
                      mk_hits(veh=True), 4, *mem)
    assert bool(ev.veh) and float(ev.intensity) == pytest.approx(3.0)
    mem = (ev.col_xy, ev.col_time, ev.col_id)

    # still in contact at the same spot one tick later -> suppressed
    ev2 = dedup_events(ego, jnp.asarray(1.1), jnp.asarray(False),
                       mk_hits(veh=True), 4, *mem)
    assert not bool(ev2.any)

    # same actor again 2 m away within 3 m radius -> suppressed
    ego2 = ego.replace(xy=jnp.asarray([2.0, 0.0]))
    ev3 = dedup_events(ego2, jnp.asarray(2.0), jnp.asarray(False),
                       mk_hits(veh=True), 4, *(ev2.col_xy, ev2.col_time,
                                               ev2.col_id))
    assert not bool(ev3.any)

    # 6 m away (location forgotten) and > 5 s later (id expired) -> event
    ego3 = ego.replace(xy=jnp.asarray([6.0, 0.0]))
    ev4 = dedup_events(ego3, jnp.asarray(7.0), jnp.asarray(False),
                       mk_hits(veh=True), 4, *(ev3.col_xy, ev3.col_time,
                                               ev3.col_id))
    assert bool(ev4.veh)

    # 6 m away but SAME actor within 5 s -> still suppressed (id rule)
    ev5 = dedup_events(ego3, jnp.asarray(2.0), jnp.asarray(False),
                       mk_hits(veh=True), 4, *(ev.col_xy, ev.col_time,
                                               ev.col_id))
    assert not bool(ev5.veh)

    # static collision never sets the id rule; it fires by location only
    ev6 = dedup_events(ego3, jnp.asarray(2.0), jnp.asarray(True),
                       mk_hits(), 4, *(ev.col_xy, ev.col_time, ev.col_id))
    assert bool(ev6.static) and float(ev6.intensity) == pytest.approx(2.0)


def test_traffic_env_still_deterministic(scene):
    from gail_carla_tpu.algo.expert import generate_demos

    cfg = EnvConfig(train=False, n_npc_vehicles=4, n_npc_walkers=2)
    d1 = generate_demos(scene, cfg, jax.random.PRNGKey(3),
                        jnp.zeros((1,), jnp.int32), 150)
    d2 = generate_demos(scene, cfg, jax.random.PRNGKey(3),
                        jnp.zeros((1,), jnp.int32), 150)
    np.testing.assert_array_equal(np.asarray(d1.actions),
                                  np.asarray(d2.actions))
