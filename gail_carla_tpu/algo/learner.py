"""The WDGAIL learner: one jitted update = rollout + discriminator epochs +
reward relabel + GAE + PPO.

Replaces the reference's outer loop ``tools/learn.py:89-306`` (which shuttles
tensors between CPU workers and the GPU and swaps the actor/discriminator
between devices every phase, learn.py:108-109/140-141/214-215). Here the
whole update is a single on-device program; the host loop only carries the
LearnerState handle, applies the warm-up epoch count, and logs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.algo import ppo as ppo_mod
from gail_carla_tpu.algo import wdgail as wdgail_mod
from gail_carla_tpu.algo.buffers import ExpertBuffer
from gail_carla_tpu.algo.rollout import collect_rollout
from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.models.discriminator import init_discriminator
from gail_carla_tpu.models.policy import init_policy
from gail_carla_tpu.ops.gae import compute_returns
from gail_carla_tpu.scene.scene import StaticScene
from gail_carla_tpu.sim.env import reset_batch
from gail_carla_tpu.utils import running_mean_std as rms_mod


@struct.dataclass
class LearnerState:
    policy_params: dict
    policy_opt: tuple
    disc_params: dict
    disc_opt: tuple
    env_states: object
    metrics: jnp.ndarray
    render: object
    gail_gamma: jnp.ndarray      # () f32, BCGAIL weight, decays per update
    rng: jax.Array
    update_i: jnp.ndarray        # () i32
    reward_rms: object = None    # RunningMeanStd of the DISCOUNTED gail
                                 # return (tcfg.gail_norm_reward)
    returns_acc: object = None   # (N,) per-env discounted-return carry


def _dummy_expert(env_cfg: EnvConfig) -> ExpertBuffer:
    from gail_carla_tpu.sim.env import RenderState

    if env_cfg.obs_mode == "state":
        from gail_carla_tpu.ops.state_obs import STATE_OBS_DIM

        obs = jnp.zeros((1, STATE_OBS_DIM), jnp.float32)
    else:
        c = 6 if env_cfg.obs_mode == "bev6" else 3
        w = env_cfg.bev_width
        obs = jnp.zeros((1, c, w, w), jnp.uint8)
    return ExpertBuffer(
        render=RenderState(
            xy=jnp.zeros((1, 2)), yaw=jnp.zeros((1,)),
            route_id=jnp.zeros((1,), jnp.int32),
            head=jnp.zeros((1,), jnp.int32),
            step=jnp.zeros((1,), jnp.int32),
            stop_idx=jnp.full((1,), -1, jnp.int32),
            npc_pose=jnp.zeros((1, 0, 3)),
            walker_pose=jnp.zeros((1, 0, 3)),
        ),
        metrics=jnp.zeros((1, 4)),
        obs=obs,
        actions=jnp.zeros((1, 2)),
    )


class WDGAILLearner:
    """Host-side handle: builds nets/optimizers, owns the jitted update.
    With tcfg.algo == "ppo" the discriminator phases are skipped and GAE
    runs on the env reward (no expert buffer needed)."""

    def __init__(
        self,
        scene: StaticScene,
        env_cfg: EnvConfig,
        model_cfg: ModelConfig,
        tcfg: TrainConfig,
        expert: ExpertBuffer,
        expert_val: Optional[ExpertBuffer] = None,
        store_obs: bool = True,
        axis_name: Optional[str] = None,
        jit_update: bool = True,
    ):
        self.axis_name = axis_name
        self.scene = scene
        self.env_cfg = env_cfg
        self.model_cfg = model_cfg
        self.tcfg = tcfg
        if expert is None:
            if tcfg.algo != "ppo":
                raise ValueError("WDGAIL needs an expert buffer")
            expert = _dummy_expert(env_cfg)  # untouched in ppo-only mode
        self.expert = expert
        self.expert_val = expert_val if expert_val is not None else expert
        self.store_obs = store_obs

        if env_cfg.obs_mode == "state":
            from gail_carla_tpu.ops.state_obs import STATE_OBS_DIM

            obs_shape = (STATE_OBS_DIM,)
        elif env_cfg.obs_mode == "bev6":
            obs_shape = (6, env_cfg.bev_width, env_cfg.bev_width)
        else:
            obs_shape = (3, env_cfg.bev_width, env_cfg.bev_width)
        rng = jax.random.PRNGKey(tcfg.seed)
        k_p, k_d, self._init_rng = jax.random.split(rng, 3)
        self.policy_net, policy_params = init_policy(
            k_p, model_cfg, obs_shape
        )
        self.disc_net, disc_params = init_discriminator(
            k_d, model_cfg, obs_shape
        )
        self.policy_optimizer = ppo_mod.make_policy_optimizer(tcfg)
        disc_mb = tcfg.gail_epoch * max(
            min(self.expert.size, tcfg.steps_per_env * tcfg.n_envs)
            // tcfg.gail_batch_size, 1
        )
        self.disc_optimizer = wdgail_mod.make_disc_optimizer(
            tcfg, mb_per_update=disc_mb
        )
        self._policy_params0 = policy_params
        self._disc_params0 = disc_params

        # Expert buffers are passed as ARGUMENTS, not closed over: closure
        # arrays are baked into the HLO as constants, and a GB-scale demo
        # buffer blows past compiler request limits (and bloats every
        # recompile). The scene (few MB of segment tables) stays closed over.
        self._update_fn = (
            jax.jit(self._update) if jit_update else self._update
        )

    def init_state(self, route_ids=None) -> LearnerState:
        tcfg = self.tcfg
        if route_ids is None:
            routes = tcfg.routes
            route_ids = jnp.asarray(
                [routes[i % len(routes)] for i in range(tcfg.n_envs)],
                jnp.int32,
            )
        rng, k_env = jax.random.split(self._init_rng)
        env_states, metrics, render = reset_batch(
            self.scene, self.env_cfg, k_env, route_ids
        )
        return LearnerState(
            policy_params=self._policy_params0,
            policy_opt=self.policy_optimizer.init(self._policy_params0),
            disc_params=self._disc_params0,
            disc_opt=self.disc_optimizer.init(self._disc_params0),
            env_states=env_states,
            metrics=metrics,
            render=render,
            gail_gamma=jnp.asarray(tcfg.gail_gamma, jnp.float32),
            rng=rng,
            update_i=jnp.zeros((), jnp.int32),
            reward_rms=rms_mod.make_rms(),
            returns_acc=jnp.zeros((route_ids.shape[0],), jnp.float32),
        )

    def _update(self, state: LearnerState, n_disc_epochs,
                expert=None, expert_val=None):
        expert = expert if expert is not None else self.expert
        expert_val = (
            expert_val if expert_val is not None else self.expert_val
        )
        scene, env_cfg, tcfg = self.scene, self.env_cfg, self.tcfg
        rng, k_roll, k_disc, k_ppo, k_val1, k_val2 = jax.random.split(
            state.rng, 6
        )

        env_states, metrics, render, rollout, ep_stats = collect_rollout(
            scene, env_cfg, self.policy_net, state.policy_params,
            state.env_states, state.metrics, state.render,
            k_roll, tcfg.steps_per_env, self.store_obs,
        )

        if tcfg.algo == "ppo":
            # PPO-only (BASELINE config #2): no discriminator — GAE runs on
            # the env reward (gail_coef 0 / env_coef 1 flips the mix from
            # tools/storage.py:41-42).
            disc_params, disc_opt = state.disc_params, state.disc_opt
            reward_rms = state.reward_rms
            returns_acc = state.returns_acc
            z = jnp.zeros(())
            disc_aux = {}
            pre_wd = pre_e = pre_p = post_wd = post_e = post_p = z
            returns = compute_returns(
                rollout.gail_rewards, rollout.env_rewards, rollout.values,
                rollout.masks, tcfg.gamma, tcfg.gae_lambda,
                gail_coef=0.0, env_coef=1.0,
            )
            gail_rewards = rollout.gail_rewards
        else:
            pre_wd, pre_e, pre_p = wdgail_mod.validation_wd(
                scene, env_cfg, self.disc_net, state.disc_params, rollout,
                expert_val, k_val1,
            )

            disc_params, disc_opt, disc_aux = wdgail_mod.disc_update(
                scene, env_cfg, tcfg, self.disc_net, state.disc_params,
                self.disc_optimizer, state.disc_opt, rollout, expert,
                k_disc, n_disc_epochs, axis_name=self.axis_name,
            )

            post_wd, post_e, post_p = wdgail_mod.validation_wd(
                scene, env_cfg, self.disc_net, disc_params, rollout,
                expert_val, k_val2,
            )

            gail_raw = wdgail_mod.relabel_rewards(
                scene, env_cfg, self.disc_net, disc_params, rollout
            )
            reward_rms = state.reward_rms
            returns_acc = state.returns_acc
            shifted = gail_raw + tcfg.gail_reward_shift
            if tcfg.gail_norm_reward:
                # VecNormalize-style return normalisation — what the
                # reference's dormant ret_rms (algo/wdgail.py:38) was
                # for: track the DISCOUNTED gail return per env, scale
                # rewards by its running std (scale-only, so softplus's
                # positivity/survival bias survives; normalising by the
                # raw reward std instead explodes when D barely
                # separates). The SHIFTED reward is what gets tracked
                # and scaled: dividing only softplus(D) while adding the
                # survival shift afterwards would let the shift dominate
                # as sigma grows — scaling both preserves the
                # shift/discrimination balance the terminal modes are
                # tuned around. The tracker is the clamped-EMA
                # update_scale, NOT cumulative Chan moments: the disc
                # warm-up phase drifts D's absolute level to ~+7 and the
                # resulting return spike (std ~300 vs ~3 steady) poisons
                # a never-forgetting normaliser for the whole run
                # (measured: runs/r3b_s0_stage1 flat at
                # gail_reward_mean 0.001). Moments pmean'd across the
                # mesh so replicated state stays bitwise equal.
                def ret_body(acc, inp):
                    r, m_next = inp
                    acc2 = acc * tcfg.gamma + r
                    return acc2 * m_next, acc2

                returns_acc, rets = jax.lax.scan(
                    ret_body, returns_acc,
                    (shifted, rollout.masks[1:]),
                )
                reward_rms = rms_mod.update_scale(
                    reward_rms, rets.reshape(-1),
                    axis_name=self.axis_name,
                )
                shifted = jnp.clip(
                    shifted / (reward_rms.std + 1e-8), -10.0, 10.0
                )
            gail_rewards = shifted
            rollout = rollout.replace(gail_rewards=gail_rewards)

            returns = compute_returns(
                rollout.gail_rewards, rollout.env_rewards, rollout.values,
                rollout.masks, tcfg.gamma, tcfg.gae_lambda,
            )

        # BCGAIL: the reference computes the BC term even when its weight is
        # zero (params_variable.json ships gailgamma=0.0, and gamma*decay
        # stays 0) — that doubles PPO's forward/backward batches for a
        # no-op. Skip it statically when the weight can never be nonzero;
        # bc_loss logs as 0 (which is also its true value).
        bc_active = tcfg.bcgail and tcfg.gail_gamma > 0.0
        policy_params, policy_opt, ppo_aux = ppo_mod.ppo_update(
            scene, env_cfg, tcfg, self.policy_net, state.policy_params,
            self.policy_optimizer, state.policy_opt, rollout, returns,
            k_ppo, state.gail_gamma,
            expert if bc_active else None,
            axis_name=self.axis_name,
        )

        new_state = LearnerState(
            policy_params=policy_params,
            policy_opt=policy_opt,
            disc_params=disc_params,
            disc_opt=disc_opt,
            env_states=env_states,
            metrics=metrics,
            render=render,
            gail_gamma=state.gail_gamma * tcfg.decay,  # ppo.py:136-137
            rng=rng,
            update_i=state.update_i + 1,
            reward_rms=reward_rms,
            returns_acc=returns_acc,
        )
        metrics_out = dict(ep_stats)
        metrics_out.update({f"disc/{k}": v for k, v in disc_aux.items()})
        metrics_out.update({f"ppo/{k}": v for k, v in ppo_aux.items()})
        metrics_out.update(
            {
                "disc/pre_val_wd": pre_wd,
                "disc/pre_val_expert": pre_e,
                "disc/pre_val_policy": pre_p,
                "disc/post_val_wd": post_wd,
                "disc/post_val_expert": post_e,
                "disc/post_val_policy": post_p,
                "ppo/gail_gamma": state.gail_gamma,
                "ppo/steer_std": jnp.exp(
                    jnp.asarray(self.model_cfg.logstd[0])
                ),
                "ppo/throttle_std": jnp.exp(
                    jnp.asarray(self.model_cfg.logstd[1])
                ),
                "gail_reward_mean": jnp.mean(gail_rewards),
                "disc/reward_rms_std": reward_rms.std,
            }
        )
        return new_state, metrics_out

    def update(self, state: LearnerState) -> Tuple[LearnerState, dict]:
        """One WDGAIL update; host computes the warm-up epoch count
        (tools/learn.py:146-151) and feeds it as a traced scalar so one
        compiled program serves the whole schedule."""
        i_update = int(state.update_i) + 1
        n_epochs = wdgail_mod.warmup_epochs(self.tcfg, i_update)
        return self._update_fn(
            state, jnp.asarray(n_epochs, jnp.int32),
            self.expert, self.expert_val,
        )
