"""Static OBB obstacles (VERDICT round-1 item #7).

The reference's collision sensor fires on static actors (buildings, poles)
with penalty 0.65 (criteria/collision.py:49-112,
ego_vehicle_handler.py:9-13). Here blocks of the grid town are filled with
building OBBs (scene/town.py::grid_building_obstacles) and the ego's OBB is
SAT-tested against them every step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.routes import generate_routes
from gail_carla_tpu.scene.scene import build_scene
from gail_carla_tpu.scene.town import grid_building_obstacles, make_grid_town
from gail_carla_tpu.sim.env import reset_env, step_env


@pytest.fixture(scope="module")
def obstacle_scene():
    graph = make_grid_town(nx=3, ny=3, block=80.0)
    routes = generate_routes(graph, n_routes=2, min_length=150.0, seed=3)
    obstacles = grid_building_obstacles(nx=3, ny=3, block=80.0)
    return build_scene(graph, routes, obstacles=obstacles)


def _run(scene, steer, n_steps=240):
    cfg = EnvConfig(train=False, obs_mode="state")
    state = reset_env(
        scene, cfg, jax.random.PRNGKey(0), jnp.zeros((), jnp.int32)
    )

    @jax.jit
    def go(state):
        def body(c, _):
            st, latched = c
            st2, out = step_env(
                scene, cfg, st, jnp.asarray([steer, 0.8])
            )
            first = out.done & (~latched["done"])
            latched = {
                "done": latched["done"] | out.done,
                "static": latched["static"]
                | (out.info["n_collisions_layout"] > 0),
                "penalty": jnp.where(
                    first, out.info["score_penalty"], latched["penalty"]
                ),
            }
            return (st2, latched), None

        l0 = {"done": jnp.zeros((), bool),
              "static": jnp.zeros((), bool),
              "penalty": jnp.zeros(())}
        (_, latched), _ = jax.lax.scan(
            body, (state, l0), None, length=n_steps
        )
        return latched

    return jax.tree.map(np.asarray, go(state))


def test_scene_carries_obstacles(obstacle_scene):
    assert obstacle_scene.ob_n == 4          # (3-1) x (3-1) blocks
    assert obstacle_scene.ob_extent.shape[1] == 2
    # buildings inset from the roads
    assert float(obstacle_scene.ob_extent.max()) < 40.0


def test_driving_into_block_corner_is_layout_collision(obstacle_scene):
    """Hard right off the road plows into the first block's building."""
    out = _run(obstacle_scene, steer=0.55)
    assert bool(out["static"])
    # leaderboard penalty 0.65 applied (score_penalty is x100 in info)
    assert float(out["penalty"]) <= 65.0 + 1e-3


def test_straight_on_road_is_clean(obstacle_scene):
    """Obstacles must not fire while the ego keeps to the lane."""
    from gail_carla_tpu.agents.autopilot import autopilot_act, make_autopilot

    cfg = EnvConfig(train=False, obs_mode="state")
    state = reset_env(
        obstacle_scene, cfg, jax.random.PRNGKey(0),
        jnp.zeros((), jnp.int32),
    )
    ap = make_autopilot()

    @jax.jit
    def go(state, ap):
        def body(c, _):
            st, ap, hit = c
            ap2, act = autopilot_act(obstacle_scene, ap, st)
            st2, out = step_env(obstacle_scene, cfg, st, act)
            return (st2, ap2, hit | (out.info["n_collisions_layout"] > 0)), None

        (_, _, hit), _ = jax.lax.scan(
            body, (state, ap, jnp.zeros((), bool)), None, length=400
        )
        return hit

    assert not bool(np.asarray(go(state, ap)))
