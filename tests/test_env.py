import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene
from gail_carla_tpu.sim.env import reset_batch, step_batch, step_env
from gail_carla_tpu.algo.expert import generate_demos
from gail_carla_tpu.ops.bev import render_bev


@pytest.fixture(scope="module")
def scene():
    return make_benchmark_scene(n_routes=3, nx=3, ny=3, block=80.0,
                                min_length=200.0)


EVAL_CFG = EnvConfig(train=False)


def test_reset_batch_shapes_and_metrics(scene):
    rng = jax.random.PRNGKey(0)
    route_ids = jnp.array([0, 1, 2, 0], jnp.int32)
    states, metrics, render = reset_batch(scene, EVAL_CFG, rng, route_ids)
    assert metrics.shape == (4, 4)
    # command is a valid RoadOption (1..6)
    cmd = np.asarray(metrics[:, 3])
    assert ((cmd >= 1) & (cmd <= 6)).all()
    # speed starts at 0
    np.testing.assert_allclose(np.asarray(metrics[:, 2]), 0.0)
    # target gps decodes to a point within 60 m of spawn (plan spacing 50 m)
    from gail_carla_tpu.sim.transforms import gps_to_location
    tgt = np.asarray(gps_to_location(metrics[:, :2]))
    spawn = np.asarray(states.ego.xy)
    assert (np.linalg.norm(tgt - spawn, axis=1) < 60.0).all()


def test_step_moves_forward_and_rewards_progress(scene):
    rng = jax.random.PRNGKey(1)
    route_ids = jnp.zeros((2,), jnp.int32)
    states, metrics, _ = reset_batch(scene, EVAL_CFG, rng, route_ids)
    actions = jnp.tile(jnp.array([0.0, 0.8]), (2, 1))
    total_r = np.zeros(2)
    for _ in range(30):  # 3 s straight driving from spawn (stay on route)
        states, out = step_batch(scene, EVAL_CFG, states, actions)
        assert not np.asarray(out.done).any()
        total_r += np.asarray(out.reward)
    assert (np.asarray(states.ego.speed) > 3.0).all()
    assert (total_r > 0.005).all()  # route completion fraction grew
    assert (np.asarray(states.head) > 5).all()  # cursor tracked the ego


def test_vmap_consistency_single_vs_batch(scene):
    """SURVEY.md §4(c): stepping one env == the batch slice."""
    rng = jax.random.PRNGKey(2)
    route_ids = jnp.array([0, 1], jnp.int32)
    states, _, _ = reset_batch(scene, EVAL_CFG, rng, route_ids)
    action = jnp.array([0.05, 0.7])
    actions = jnp.stack([jnp.array([-0.3, 0.2]), action])

    batched, out_b = step_batch(scene, EVAL_CFG, states, actions)
    single_state = jax.tree.map(lambda a: a[1], states)
    single, out_s = step_env(scene, EVAL_CFG, single_state, action)

    np.testing.assert_allclose(
        np.asarray(batched.ego.xy[1]), np.asarray(single.ego.xy), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_b.metrics[1]), np.asarray(out_s.metrics), rtol=1e-5
    )
    assert bool(out_b.done[1]) == bool(out_s.done)


def test_blocked_terminates_and_autoresets(scene):
    cfg = EnvConfig(train=False, blocked_time=3.0)  # shrink 90 s for test
    rng = jax.random.PRNGKey(3)
    states, _, _ = reset_batch(scene, cfg, rng, jnp.zeros((1,), jnp.int32))
    actions = jnp.zeros((1, 2))  # never move
    done_seen = False
    for i in range(40):
        states, out = step_batch(scene, cfg, states, actions)
        if bool(out.done[0]):
            done_seen = True
            assert bool(out.info["blocked"][0])
            break
    assert done_seen
    # auto-reset: state counters are fresh
    assert int(states.step[0]) == 0
    assert float(states.episode_reward[0]) == 0.0


def test_deviation_terminates(scene):
    rng = jax.random.PRNGKey(4)
    states, _, _ = reset_batch(scene, EVAL_CFG, rng,
                               jnp.zeros((1,), jnp.int32))
    actions = jnp.tile(jnp.array([0.6, 0.9]), (1, 1))  # hard right, off road
    flags = []
    for _ in range(300):
        states, out = step_batch(scene, EVAL_CFG, states, actions)
        if bool(out.done[0]):
            flags.append(
                (bool(out.info["route_deviation"][0]),
                 bool(out.info["collision"][0]))
            )
            break
    assert flags and (flags[0][0] or flags[0][1])


def test_expert_completes_routes(scene):
    """Golden behavioural test (SURVEY.md §4(b)): the PID autopilot must
    complete every benchmark route, like BasicAgent does on the reference
    routes (carla_exp.py:50 loops until route_completed)."""
    cfg = EnvConfig(train=False)
    rng = jax.random.PRNGKey(5)
    route_ids = jnp.arange(3, dtype=jnp.int32)
    demos = generate_demos(
        scene, cfg, rng, route_ids, n_steps=1000, with_noise=False
    )
    valid = np.asarray(demos.valid)
    # every env produced at least one completed episode
    assert (valid.any(axis=0)).all(), "some route never completed"
    # speeds reach near the 6 m/s target
    sp = np.asarray(demos.metrics[..., 2])
    assert sp.max() > 5.0
    # actions stay in the control range
    act = np.asarray(demos.actions)
    assert (np.abs(act[..., 0]) <= 1.0).all()
    assert (act[..., 1] >= 0.0).all() and (act[..., 1] <= 1.0).all()


def test_expert_with_noise_still_completes(scene):
    cfg = EnvConfig(train=False)
    demos = generate_demos(
        scene, cfg, jax.random.PRNGKey(6),
        jnp.zeros((2,), jnp.int32), n_steps=1000, with_noise=True,
    )
    valid = np.asarray(demos.valid)
    assert valid.any(), "noisy expert never completed the route"


def test_render_bev_basics(scene):
    cfg = EnvConfig(train=False)
    rng = jax.random.PRNGKey(7)
    states, _, render = reset_batch(scene, cfg, rng,
                                    jnp.zeros((1,), jnp.int32))
    r0 = jax.tree.map(lambda a: a[0], render)
    img = np.asarray(
        render_bev(scene, cfg, r0.xy, r0.yaw, r0.route_id, r0.head)
    )
    assert img.shape == (3, 192, 192)
    assert img.min() >= 0.0 and img.max() <= 1.0
    road, route, lane = img
    assert road.mean() > 0.02          # some road visible
    assert route.sum() > 50            # route ahead drawn
    # ego sits 40 px from the bottom facing up: the route should extend
    # above the ego row (row < 152) much more than below it
    ego_row = 192 - cfg.pixels_ev_to_bottom
    assert route[:ego_row].sum() > 3 * route[ego_row:].sum()
    # lane markings are thinner than road
    assert 0 < lane.mean() < road.mean()


def test_determinism(scene):
    cfg = EnvConfig(train=True)
    out1 = generate_demos(scene, cfg, jax.random.PRNGKey(8),
                          jnp.zeros((1,), jnp.int32), 200)
    out2 = generate_demos(scene, cfg, jax.random.PRNGKey(8),
                          jnp.zeros((1,), jnp.int32), 200)
    np.testing.assert_array_equal(
        np.asarray(out1.actions), np.asarray(out2.actions)
    )
    np.testing.assert_array_equal(
        np.asarray(out1.metrics), np.asarray(out2.metrics)
    )


def test_compliant_expert_obeys_signals(scene):
    """obey_signals=True: the braking-profile expert must eliminate
    stop-sign infractions and keep completing routes (the default expert is
    signal-blind like the reference's BasicAgent)."""
    cfg = EnvConfig(train=False)
    demos = generate_demos(
        scene, cfg, jax.random.PRNGKey(11), jnp.zeros((1,), jnp.int32),
        n_steps=1500, with_noise=False, obey_signals=True,
    )
    assert np.asarray(demos.valid).any(), "compliant expert never completed"
