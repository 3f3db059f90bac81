import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene


def _replicated_bitwise(tree) -> bool:
    """True iff every leaf's per-device copies are bitwise identical."""
    for leaf in jax.tree.leaves(tree):
        shards = leaf.addressable_shards
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(ref, np.asarray(s.data)):
                return False
    return True


def _perturb_one_replica(tree, device_idx: int):
    """Inject divergence: add 1.0 to the first leaf's copy on one device
    (simulates an unsynced update / RNG divergence)."""
    leaves, treedef = jax.tree.flatten(tree)
    leaf = leaves[0]
    bufs = []
    for i, s in enumerate(leaf.addressable_shards):
        arr = np.asarray(s.data).copy()
        if i == device_idx:
            arr = arr + 1.0
        bufs.append(jax.device_put(arr, s.device))
    leaves[0] = jax.make_array_from_single_device_arrays(
        leaf.shape, leaf.sharding, bufs
    )
    return jax.tree.unflatten(treedef, leaves)


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
        gail_norm_reward=True, gail_use_linear_lr_decay=True,
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

    # env state is actually sharded over dp; params replicated
    sh = state.env_states.ego.speed.sharding
    assert isinstance(sh, NamedSharding) and sh.spec == P("dp")
    assert len(state.env_states.ego.speed.devices()) == 8
    psh = jax.tree.leaves(state.policy_params)[0].sharding
    assert psh.spec == P()

    # the expert buffer shards over the demo axis: 16 transitions per
    # device, not 128 replicated (VERDICT r2 next-step #6)
    assert learner.shard_expert
    esh = learner.expert.actions.sharding
    assert isinstance(esh, NamedSharding) and esh.spec == P("dp")
    assert learner.expert.actions.addressable_shards[0].data.shape[0] == 16

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

    # after 2 pmean-synced updates every replica must hold bitwise
    # identical params and optimizer state on every device
    assert _replicated_bitwise(state.policy_params)
    assert _replicated_bitwise(state.disc_params)
    assert _replicated_bitwise(state.policy_opt)
    # reward RMS folds in pmean'd GLOBAL moments -> replicas bitwise equal,
    # and the running var must have moved off its init (it saw rewards)
    assert _replicated_bitwise(state.reward_rms)
    assert float(state.reward_rms.count) > 1.0

    # red/green flip: inject divergence on one replica and show the
    # invariant check catches it — and that an update does NOT silently
    # re-sync it (pmean averages gradients, not params)
    bad = state.replace(
        policy_params=_perturb_one_replica(state.policy_params, 3)
    )
    assert not _replicated_bitwise(bad.policy_params)
    bad2, _ = learner.update(bad)
    assert not _replicated_bitwise(bad2.policy_params)


@pytest.mark.slow
def test_sharded_vs_single_device_metrics_shape():
    """1-vs-8-device run at the same total batch: identical metric schema,
    finite values, and full episode accounting on both paths (exact value
    parity is impossible by construction — per-device rollout RNG is folded
    with the device index)."""
    from gail_carla_tpu.algo.buffers import build_expert_buffer
    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.algo.learner import WDGAILLearner
    from gail_carla_tpu.parallel.mesh import (
        ShardedWDGAILLearner, make_mesh,
    )

    scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env_cfg = EnvConfig(train=True, bev_width=64)
    model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=32,
                            head_size=16, disc_hidden=16, dtype="float32")
    tcfg = TrainConfig(
        n_envs=8, num_steps=8 * 16, mini_batch_size=8, ppo_epoch=1,
        gail_batch_size=8, gail_pre_epoch=1, gail_epoch=1, gail_thre=1,
        routes=(0, 1),
    )
    demos = generate_demos(
        scene, EnvConfig(train=False, bev_width=64),
        jax.random.PRNGKey(0), jnp.arange(2, dtype=jnp.int32),
        n_steps=900, with_noise=False,
    )
    expert = build_expert_buffer(scene, env_cfg, demos, size=128)

    single = WDGAILLearner(scene, env_cfg, model_cfg, tcfg, expert)
    s1, m1 = single.update(single.init_state())
    sharded = ShardedWDGAILLearner(
        scene, env_cfg, model_cfg, tcfg, expert, mesh=make_mesh(8)
    )
    s8, m8 = sharded.update(sharded.init_state())

    assert set(m1.keys()) == set(m8.keys())
    for k in m8:
        assert np.isfinite(float(m8[k])), k
        assert np.isfinite(float(m1[k])), k
