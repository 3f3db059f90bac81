"""Multi-chip scale-out: env data-parallelism over a jax.sharding.Mesh.

The reference scales by adding CARLA servers and host/port entries
(``params_variable.json:15-26``, two hosts x five servers) wired through
SubprocVecEnv pipes. The TPU equivalent (SURVEY §2.2): shard the env batch
over the mesh's ``dp`` axis with ``shard_map``; model parameters are
replicated; gradient reduction is a ``pmean`` over ICI. There is no
cross-device traffic inside an env step at all — each world is device-local.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gail_carla_tpu.algo.buffers import ExpertBuffer
from gail_carla_tpu.algo.learner import LearnerState, WDGAILLearner
from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.scene.scene import StaticScene


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedWDGAILLearner(WDGAILLearner):
    """WDGAILLearner whose update runs under shard_map over the env axis.

    Per-device semantics: each device owns n_envs/D worlds, collects its own
    rollout slice, draws minibatches from its local buffer, and contributes
    pmean'd gradients — every replica applies the identical optimizer step.
    Expert buffers SHARD along the demo axis (``shard_expert``, default on):
    each device holds size/D transitions and draws disc/BC minibatches from
    its local shard — the per-host dataloader semantics of the reference's
    two-machine setup (SURVEY §5), and 1/D the HBM of the round-2
    replicated layout (which capped the minibatch size, RESULTS.md).
    """

    AXIS = "dp"

    def __init__(
        self,
        scene: StaticScene,
        env_cfg: EnvConfig,
        model_cfg: ModelConfig,
        tcfg: TrainConfig,
        expert: ExpertBuffer,
        expert_val: Optional[ExpertBuffer] = None,
        store_obs: bool = True,
        mesh: Optional[Mesh] = None,
        shard_expert: bool = True,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        if tcfg.n_envs % n_dev:
            raise ValueError(
                f"n_envs={tcfg.n_envs} must divide over {n_dev} devices"
            )

        def _trim(buf):
            # demo rows repeat cyclically (build_expert_buffer), so
            # trimming to a device multiple loses only duplicates
            m = (buf.size // n_dev) * n_dev
            return jax.tree.map(lambda a: a[:m], buf)

        self.shard_expert = bool(
            shard_expert and expert is not None
            and expert.size >= n_dev and tcfg.algo != "ppo"
        )
        if self.shard_expert:
            expert = _trim(expert)
            if expert_val is not None and expert_val.size >= n_dev:
                expert_val = _trim(expert_val)
            else:
                expert_val = expert
        super().__init__(
            scene, env_cfg, model_cfg, tcfg, expert, expert_val,
            store_obs=store_obs, axis_name=self.AXIS, jit_update=False,
        )
        if self.shard_expert:
            # place the shards now: each device holds size/D transitions
            # (jit would otherwise reshard at every dispatch)
            sh = NamedSharding(self.mesh, P(self.AXIS))
            self.expert = jax.tree.map(
                lambda a: jax.device_put(a, sh), self.expert
            )
            self.expert_val = jax.tree.map(
                lambda a: jax.device_put(a, sh), self.expert_val
            )
            # the disc LR schedule counts optimizer steps per update;
            # with a sharded buffer each device runs min(size/D, ...)
            # minibatches, so rebuild the optimizer with the local count
            from gail_carla_tpu.algo import wdgail as wdgail_mod

            local = self.expert.size // n_dev
            disc_mb = tcfg.gail_epoch * max(
                min(local, tcfg.steps_per_env * tcfg.n_envs // n_dev)
                // tcfg.gail_batch_size, 1
            )
            self.disc_optimizer = wdgail_mod.make_disc_optimizer(
                tcfg, mb_per_update=disc_mb
            )

        # Per-leaf specs: env-batched leaves shard on dp, everything else
        # (params, optimizer state, scalars) replicates.
        def state_spec(state: LearnerState):
            batched = {
                "env_states", "metrics", "render",
            }
            return LearnerState(
                **{
                    f: jax.tree.map(
                        lambda _: P(self.AXIS) if f in batched else P(),
                        getattr(state, f),
                    )
                    for f in state.__dataclass_fields__
                }
            )

        self._state_spec_fn = state_spec

        def sharded_update(state, n_epochs, expert, expert_val):
            # Per-device randomness for rollouts/minibatches comes from a
            # work key folded with the device's mesh position; the carried
            # rng advances identically on every replica so replicated state
            # stays bitwise identical.
            idx = jax.lax.axis_index(self.AXIS)
            next_rng, work = jax.random.split(state.rng)
            local = state.replace(rng=jax.random.fold_in(work, idx))
            new_state, metrics = self._update(
                local, n_epochs, expert, expert_val
            )
            new_state = new_state.replace(rng=next_rng)
            metrics = jax.tree.map(
                lambda m: jax.lax.pmean(m, self.AXIS), metrics
            )
            return new_state, metrics

        self._sharded_update = sharded_update
        self._compiled = None

    def init_state(self, route_ids=None) -> LearnerState:
        state = super().init_state(route_ids)
        spec = self._state_spec_fn(state)
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), spec,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(state, shardings)

    def update(self, state: LearnerState):
        from gail_carla_tpu.algo import wdgail as wdgail_mod

        i_update = int(state.update_i) + 1
        n_epochs = wdgail_mod.warmup_epochs(self.tcfg, i_update)
        if self._compiled is None:
            spec = self._state_spec_fn(state)
            e_spec = (
                jax.tree.map(lambda _: P(self.AXIS), self.expert)
                if self.shard_expert else P()
            )
            ev_spec = (
                jax.tree.map(lambda _: P(self.AXIS), self.expert_val)
                if self.shard_expert else P()
            )
            shmapped = jax.shard_map(
                self._sharded_update,
                mesh=self.mesh,
                in_specs=(spec, P(), e_spec, ev_spec),
                out_specs=(spec, P()),
                check_vma=False,
            )
            self._compiled = jax.jit(shmapped)
        return self._compiled(
            state, jnp.asarray(n_epochs, jnp.int32),
            self.expert, self.expert_val,
        )
