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


def test_ego_collides_with_npc(scene):
    """Teleport-free check: drive the ego into a spot occupied by an NPC by
    making NPCs static obstacles (target speed ~0 via no patrol advance is
    hard to force, so instead verify the OBB test directly through info)."""
    from gail_carla_tpu.sim.env import _dynamic_collisions
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
    col_v, col_p = _dynamic_collisions(t, DEFAULT_VEHICLE, ego)
    assert bool(col_v) and not bool(col_p)

    # walker under the bumper
    t2 = t.replace(
        veh=VehicleState(
            xy=jnp.asarray([[50.0, 50.0]]), yaw=jnp.asarray([0.0]),
            speed=jnp.zeros((1,)),
        ),
        walker_xy=jnp.asarray([[1.5, 0.0]]),
    )
    col_v, col_p = _dynamic_collisions(t2, DEFAULT_VEHICLE, ego)
    assert bool(col_p) and not bool(col_v)

    # nothing nearby
    t3 = t2.replace(walker_xy=jnp.asarray([[50.0, 0.0]]))
    col_v, col_p = _dynamic_collisions(t3, DEFAULT_VEHICLE, ego)
    assert not bool(col_v) and not bool(col_p)


def test_traffic_env_still_deterministic(scene):
    from gail_carla_tpu.algo.expert import generate_demos

    cfg = EnvConfig(train=False, n_npc_vehicles=4, n_npc_walkers=2)
    d1 = generate_demos(scene, cfg, jax.random.PRNGKey(3),
                        jnp.zeros((1,), jnp.int32), 150)
    d2 = generate_demos(scene, cfg, jax.random.PRNGKey(3),
                        jnp.zeros((1,), jnp.int32), 150)
    np.testing.assert_array_equal(np.asarray(d1.actions),
                                  np.asarray(d2.actions))
