"""Golden-trajectory regression (SURVEY.md §4(b)): the scripted expert on
route 0 of the small benchmark town must reproduce the recorded trace.
Catches silent drift in dynamics, controllers, route geometry, or RNG
plumbing across refactors. Regenerate tests/golden_expert_route0.npz ONLY
for intentional behavioural changes (see the script in git history)."""
import numpy as np
import pytest


def test_expert_golden_trace():
    import jax
    import jax.numpy as jnp

    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.config import EnvConfig
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    cfg = EnvConfig(train=False)
    demos = generate_demos(scene, cfg, jax.random.PRNGKey(42),
                           jnp.zeros((1,), jnp.int32), 300,
                           with_noise=False)
    gold = np.load("tests/golden_expert_route0.npz")
    np.testing.assert_allclose(
        np.asarray(demos.render.xy[:, 0]), gold["xy"], atol=1e-3,
        err_msg="expert trajectory drifted from the golden trace",
    )
    np.testing.assert_allclose(
        np.asarray(demos.actions[:, 0]), gold["actions"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(demos.metrics[:, 0]), gold["metrics"], atol=1e-4
    )
