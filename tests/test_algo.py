import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.ops.gae import compute_returns


def test_gae_matches_reference_loop():
    """Numerical parity with tools/storage.py:37-50."""
    rng = np.random.default_rng(0)
    T, N = 17, 3
    gail_r = rng.normal(size=(T, N)).astype(np.float32)
    env_r = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T + 1, N)).astype(np.float32)
    masks = (rng.random((T + 1, N)) > 0.2).astype(np.float32)
    gamma, lam = 0.99, 0.95

    # reference loop
    returns_ref = np.zeros((T, N), np.float32)
    gae = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        delta = (
            1.0 * gail_r[t] + 0.0 * env_r[t]
            + gamma * values[t + 1] * masks[t + 1] - values[t]
        )
        gae = delta + gamma * lam * masks[t + 1] * gae
        returns_ref[t] = gae + values[t]

    got = compute_returns(
        jnp.asarray(gail_r), jnp.asarray(env_r), jnp.asarray(values),
        jnp.asarray(masks), gamma, lam,
    )
    np.testing.assert_allclose(np.asarray(got), returns_ref, rtol=1e-5)


def test_policy_shapes_and_distribution():
    from gail_carla_tpu.models.policy import (
        act, evaluate_actions, init_policy, normal_logprob,
    )

    cfg = ModelConfig()
    net, params = init_policy(jax.random.PRNGKey(0), cfg, (3, 64, 64))
    obs = jnp.zeros((5, 3, 64, 64))
    metrics = jnp.tile(jnp.array([0.001, 0.002, 3.0, 4.0]), (5, 1))
    value, action, logp = act(net, params, obs, metrics,
                              jax.random.PRNGKey(1))
    assert value.shape == (5,) and action.shape == (5, 2)
    # with use_activation, deterministic actions obey tanh/sigmoid ranges
    _, det, _ = act(net, params, obs, metrics, jax.random.PRNGKey(2),
                    deterministic=True)
    assert (np.abs(np.asarray(det[:, 0])) <= 1.0).all()
    assert (np.asarray(det[:, 1]) >= 0.0).all()
    # logprob agrees with the analytic diagonal normal
    v2, lp2, ent = evaluate_actions(net, params, obs, metrics, action)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(logp), rtol=1e-5)
    mean_lp = normal_logprob(det, det, jnp.tile(jnp.array([-1.4, -3.2]),
                                                (5, 1)))
    expected = -0.5 * (2 * np.log(2 * np.pi)) + 1.4 + 3.2
    np.testing.assert_allclose(np.asarray(mean_lp), expected, rtol=1e-5)


def test_discriminator_reward_positive():
    from gail_carla_tpu.models.discriminator import (
        init_discriminator, predict_reward,
    )

    cfg = ModelConfig()
    net, params = init_discriminator(jax.random.PRNGKey(0), cfg, (3, 64, 64))
    r = predict_reward(
        net, params, jnp.zeros((4, 3, 64, 64)),
        jnp.zeros((4, 4)), jnp.zeros((4, 2)),
    )
    assert r.shape == (4,)
    assert (np.asarray(r) > 0).all()  # softplus is strictly positive


def test_packed_obs_roundtrip_bitexact():
    """pack_bev_obs/unpack_bev_obs reproduce the renderer's floats exactly
    for both BEV modes — the invariant that makes 1-byte/pixel storage a
    free lunch (buffers.py docstring)."""
    from gail_carla_tpu.algo.buffers import pack_bev_obs, unpack_bev_obs
    from gail_carla_tpu.ops.bev import render_bev_batch
    from gail_carla_tpu.ops.bev6 import render_bev6_batch
    from gail_carla_tpu.scene.scene import make_benchmark_scene
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    cfg6 = EnvConfig(train=False, obs_mode="bev6", n_npc_vehicles=3,
                     n_npc_walkers=2)
    states, _, render = reset_batch(
        scene, cfg6, jax.random.PRNGKey(0),
        jnp.zeros((2,), jnp.int32),
    )
    for _ in range(12):
        states, out = step_batch(
            scene, cfg6, states, jnp.tile(jnp.array([0.0, 0.6]), (2, 1))
        )

    obs6 = render_bev6_batch(scene, cfg6, out.render)
    packed = pack_bev_obs(cfg6, obs6)
    assert packed.dtype == jnp.uint8 and packed.shape == obs6.shape[:1] + \
        obs6.shape[2:]
    got = np.asarray(unpack_bev_obs(cfg6, packed))
    ref = np.asarray(obs6)
    # bitwise: same discrete levels AND the same f32 encodings of them
    assert got.tobytes() == ref.tobytes()

    # exhaustive level coverage: every combination of channel levels,
    # encoded exactly as the renderers encode them (value * INV_255)
    from gail_carla_tpu.ops.bev import INV_255
    lane_lv = jnp.asarray([0.0, 120.0, 255.0]) * INV_255
    sig_lv = jnp.asarray([0.0, 80.0, 170.0, 255.0]) * INV_255
    grids = jnp.meshgrid(
        jnp.arange(2.0), jnp.arange(2.0), lane_lv, sig_lv,
        jnp.arange(2.0), jnp.arange(2.0), indexing="ij",
    )
    all_combos = jnp.stack(
        [g.reshape(-1) for g in grids], axis=0
    ).reshape(1, 6, 12, 16)  # (1, C, 12, 16) covers all 192 codes
    rt = unpack_bev_obs(cfg6, pack_bev_obs(cfg6, all_combos))
    assert np.asarray(rt).tobytes() == np.asarray(all_combos).tobytes()

    cfg3 = EnvConfig(train=False)
    obs3 = render_bev_batch(scene, cfg3, out.render)
    got3 = np.asarray(unpack_bev_obs(cfg3, pack_bev_obs(cfg3, obs3)))
    assert got3.tobytes() == np.asarray(obs3).tobytes()
    assert set(np.unique(np.asarray(obs3[:, 2]) * 255).astype(int)) <= \
        {0, 119, 120, 255}


def test_stored_obs_matches_rematerialised_fetch():
    """fetch_rollout_obs from packed storage == re-rendering from
    RenderState for the same minibatch indices (what disc/PPO consume)."""
    from gail_carla_tpu.algo.buffers import fetch_rollout_obs
    from gail_carla_tpu.algo.rollout import collect_rollout
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.scene.scene import make_benchmark_scene
    from gail_carla_tpu.sim.env import reset_batch

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    cfg = EnvConfig(train=True, obs_mode="bev6", bev_width=64,
                    n_npc_vehicles=2, n_npc_walkers=2)
    net, params = init_policy(
        jax.random.PRNGKey(0),
        ModelConfig(conv_channels=(8, 16), hidden_size=32, head_size=16,
                    dtype="float32"),
        (6, 64, 64),
    )
    states, metrics, render = reset_batch(
        scene, cfg, jax.random.PRNGKey(1), jnp.zeros((3,), jnp.int32)
    )
    _, _, _, rollout, _ = collect_rollout(
        scene, cfg, net, params, states, metrics, render,
        jax.random.PRNGKey(2), n_steps=8, store_obs=True,
    )
    assert rollout.obs.dtype == jnp.uint8 and rollout.obs.ndim == 4

    t_idx = jnp.asarray([0, 3, 7, 5], jnp.int32)
    n_idx = jnp.asarray([0, 2, 1, 0], jnp.int32)
    stored = np.asarray(
        fetch_rollout_obs(scene, cfg, rollout, t_idx, n_idx)
    )
    remat = np.asarray(
        fetch_rollout_obs(
            scene, cfg, rollout.replace(obs=None), t_idx, n_idx
        )
    )
    assert stored.tobytes() == remat.tobytes()


@pytest.mark.slow
def test_wdgail_update_end_to_end():
    """One full fused WDGAIL update at toy scale: rollout + disc (warm-up
    epochs) + relabel + GAE + PPO all inside one jit."""
    from gail_carla_tpu.algo.buffers import build_expert_buffer
    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.algo.learner import WDGAILLearner
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env_cfg = EnvConfig(train=True, bev_width=64)
    model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=32,
                            head_size=16, disc_hidden=16, dtype="float32")
    tcfg = TrainConfig(
        n_envs=2, num_steps=64, mini_batch_size=16, ppo_epoch=2,
        gail_batch_size=16, gail_pre_epoch=2, gail_epoch=1, gail_thre=2,
        routes=(0, 1), bcgail=True, gail_gamma=0.5, decay=0.9,
    )

    demos = generate_demos(
        scene, EnvConfig(train=False, bev_width=64),
        jax.random.PRNGKey(0), jnp.arange(2, dtype=jnp.int32),
        n_steps=900, with_noise=False,
    )
    expert = build_expert_buffer(scene, env_cfg, demos, size=256)

    learner = WDGAILLearner(scene, env_cfg, model_cfg, tcfg, expert)
    state = learner.init_state()
    state, metrics = learner.update(state)

    assert int(state.update_i) == 1
    for key in ("ppo/value_loss", "ppo/action_loss", "ppo/bc_loss",
                "disc/dis_loss", "disc/dis_gp", "disc/pre_val_wd",
                "disc/post_val_wd", "gail_reward_mean"):
        v = float(metrics[key])
        assert np.isfinite(v), f"{key} not finite"
    assert float(metrics["gail_reward_mean"]) > 0.0
    # gail_gamma decayed
    assert abs(float(state.gail_gamma) - 0.5 * 0.9) < 1e-6

    # second update reuses the compiled program and keeps everything finite
    state, metrics2 = learner.update(state)
    assert np.isfinite(float(metrics2["ppo/action_loss"]))
    leaves = jax.tree.leaves(state.policy_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_ppo_only_mode_learns_env_reward():
    """BASELINE config #2: PPO-only (algo='ppo') — no discriminator, GAE on
    the env (delta-completion) reward, no expert buffer required."""
    from gail_carla_tpu.algo.learner import WDGAILLearner
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env_cfg = EnvConfig(train=True, bev_width=64)
    model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=32,
                            head_size=16, disc_hidden=16, dtype="float32")
    tcfg = TrainConfig(
        algo="ppo", n_envs=2, num_steps=64, mini_batch_size=16,
        ppo_epoch=2, routes=(0, 1), bcgail=False,
    )
    learner = WDGAILLearner(scene, env_cfg, model_cfg, tcfg, expert=None)
    state = learner.init_state()
    state, metrics = learner.update(state)
    assert np.isfinite(float(metrics["ppo/action_loss"]))
    assert float(metrics["disc/pre_val_wd"]) == 0.0
    assert "env_reward_mean" in metrics
    state, m2 = learner.update(state)
    assert int(state.update_i) == 2


@pytest.mark.slow
def test_state_obs_mode_ppo():
    """obs_mode='state': vector observations end to end (MLP encoder,
    stored-as-float rollout obs, PPO-only learner)."""
    from gail_carla_tpu.algo.learner import WDGAILLearner
    from gail_carla_tpu.ops.state_obs import STATE_OBS_DIM
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env_cfg = EnvConfig(train=True, obs_mode="state")
    model_cfg = ModelConfig(hidden_size=64, head_size=32, dtype="float32")
    tcfg = TrainConfig(
        algo="ppo", n_envs=4, num_steps=256, mini_batch_size=32,
        ppo_epoch=2, routes=(0, 1), bcgail=False, lr=3e-4,
    )
    learner = WDGAILLearner(scene, env_cfg, model_cfg, tcfg, expert=None)
    state = learner.init_state()
    rews = []
    for _ in range(4):
        state, metrics = learner.update(state)
        rews.append(float(metrics["env_reward_mean"]))
    assert all(np.isfinite(r) for r in rews)
    assert rews[-1] > rews[0], rews  # dense reward is quickly learnable


def test_reward_scale_tracker_recovers_from_warmup_spike():
    """update_scale (the GAIL reward normaliser) must forget a
    warm-up-phase outlier batch: the cumulative update_rms keeps a
    1e4x-variance spike in its denominator for hundreds of updates,
    which divided the learning signal to zero in a real run
    (runs/r3b_s0_stage1, RESULTS.md round-3 reproduction)."""
    from gail_carla_tpu.utils import running_mean_std as rms

    rng = np.random.default_rng(0)
    steady = rng.normal(0.0, 3.0, size=(7200,))
    spike = rng.normal(0.0, 300.0, size=(7200,))

    r_scale = rms.make_rms()
    r_cum = rms.make_rms()
    # 8 warm-up updates of drifted-D returns, then steady-state batches
    for _ in range(8):
        r_scale = rms.update_scale(r_scale, jnp.asarray(spike))
        r_cum = rms.update_rms(r_cum, jnp.asarray(spike))
    # the clamp bounds the spike's reach: std <= 1.25^8
    assert float(r_scale.std) <= 1.25**8 + 1e-6
    for i in range(20):
        r_scale = rms.update_scale(r_scale, jnp.asarray(steady))
        r_cum = rms.update_rms(r_cum, jnp.asarray(steady))
    # within 20 post-warm-up updates the tracker is at the true scale...
    assert 2.0 < float(r_scale.std) < 4.5, float(r_scale.std)
    # ...while the cumulative normaliser is still poisoned >40x too big
    assert float(r_cum.std) > 120.0
    # and per-update moves are always inside the geometric trust region
    before = float(r_scale.std)
    r2 = rms.update_scale(r_scale, jnp.asarray(spike))
    assert float(r2.std) <= before * 1.25 + 1e-6
