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


def test_gps_autopilot_makes_route_progress(scene):
    from gail_carla_tpu.agents.gps_autopilot import (
        gps_autopilot_act, make_gps_autopilot,
    )

    cfg = EnvConfig(train=False)
    states, _, _ = reset_batch(scene, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1,), jnp.int32))
    ap = make_gps_autopilot()

    @jax.jit
    def run(states, ap, rng):
        def body(carry, k):
            states, ap = carry
            w = jax.tree.map(lambda a: a[0], states)
            ap, action = gps_autopilot_act(scene, ap, w, k)
            states, out = step_batch(scene, cfg, states, action[None])
            return (states, ap), out.info["route_completed_in_m"][0]
        keys = jax.random.split(rng, 600)
        (states, ap), prog = jax.lax.scan(body, (states, ap), keys)
        return jnp.max(prog)

    completed = float(run(states, ap, jax.random.PRNGKey(1)))
    # the GPS expert targets 4 m/s and follows the sparse plan; it must make
    # substantial progress without leaving the route
    assert completed > 100.0, completed
