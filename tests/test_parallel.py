import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene


@pytest.mark.slow
def test_sharded_update_on_fake_mesh():
    """SURVEY.md §4(d): the full multi-chip WDGAIL update must compile and
    execute on a fake 8-device CPU mesh, with replicated leaves staying
    identical across devices."""
    from gail_carla_tpu.algo.buffers import build_expert_buffer
    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.parallel.mesh import (
        ShardedWDGAILLearner, make_mesh,
    )

    assert len(jax.devices()) >= 8, "conftest should fake 8 CPU devices"

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env_cfg = EnvConfig(train=True, bev_width=64)
    model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=32,
                            head_size=16, disc_hidden=16, dtype="float32")
    tcfg = TrainConfig(
        n_envs=8, num_steps=8 * 16, mini_batch_size=8, ppo_epoch=1,
        gail_batch_size=8, gail_pre_epoch=1, gail_epoch=1, gail_thre=1,
        routes=(0, 1), bcgail=True, gail_gamma=0.1,
    )

    demos = generate_demos(
        scene, EnvConfig(train=False, bev_width=64),
        jax.random.PRNGKey(0), jnp.arange(2, dtype=jnp.int32),
        n_steps=900, with_noise=False,
    )
    expert = build_expert_buffer(scene, env_cfg, demos, size=128)

    mesh = make_mesh(8)
    learner = ShardedWDGAILLearner(
        scene, env_cfg, model_cfg, tcfg, expert, mesh=mesh
    )
    state = learner.init_state()

    # env state is actually sharded over dp
    sh = state.env_states.ego.speed.sharding
    assert sh.num_devices if hasattr(sh, "num_devices") else True
    assert len(state.env_states.ego.speed.devices()) == 8

    state, metrics = learner.update(state)
    assert int(state.update_i) == 1
    assert np.isfinite(float(metrics["ppo/action_loss"]))
    assert np.isfinite(float(metrics["disc/dis_loss"]))
    # params replicated and finite
    leaf = jax.tree.leaves(state.policy_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()

    # second step exercises the cached compile path
    state, metrics2 = learner.update(state)
    assert int(state.update_i) == 2
    assert np.isfinite(float(metrics2["ppo/value_loss"]))
