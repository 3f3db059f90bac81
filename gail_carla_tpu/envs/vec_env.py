"""Vector-env API over the vmapped sim — the SubprocVecEnv replacement
with the reference ABC's surface (``vec_env/vec_env.py:6-104``: reset /
step_async / step_wait / step / close), minus the N worker processes and
pickled pipes: all worlds advance in one device program.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.envs.spaces import Box
from gail_carla_tpu.scene.scene import StaticScene


class TpuVecEnv:
    def __init__(
        self,
        scene: StaticScene,
        env_cfg: EnvConfig,
        num_envs: int,
        route_ids: Optional[List[int]] = None,
        seed: int = 2021,
        render_obs: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from gail_carla_tpu.ops.bev import render_bev_batch
        from gail_carla_tpu.sim import env as sim_env

        self.scene = scene
        self.cfg = env_cfg
        self.num_envs = num_envs
        self.render_obs = render_obs
        if route_ids is None:
            # tools/envs.py:29-33 round-robin
            route_ids = [i % scene.n_routes for i in range(num_envs)]
        self._route_ids = jnp.asarray(route_ids, jnp.int32)
        self._rng = jax.random.PRNGKey(seed)
        self._jax = jax
        self._jnp = jnp

        self._jit_reset = jax.jit(
            lambda k: sim_env.reset_batch(scene, env_cfg, k, self._route_ids)
        )
        self._jit_step = jax.jit(
            lambda s, a: sim_env.step_batch(scene, env_cfg, s, a)
        )
        self._jit_render = jax.jit(
            lambda r: render_bev_batch(scene, env_cfg, r)
        )
        self._state = None
        self._pending = None

        w = env_cfg.bev_width
        self.action_space = Box(-10.0, 10.0, (2,))
        self.observation_space = Box(0.0, 1.0, (3, w, w))
        self.metrics_space = Box(-100.0, 100.0, (4,))

    def reset(self):
        self._rng, k = self._jax.random.split(self._rng)
        self._state, metrics, render = self._jit_reset(k)
        obs = (
            np.asarray(self._jit_render(render)) if self.render_obs else None
        )
        return obs, np.asarray(metrics)

    def step_async(self, actions):
        self._pending = self._jnp.asarray(np.asarray(actions, np.float32))

    def step_wait(self):
        assert self._pending is not None
        self._state, out = self._jit_step(self._state, self._pending)
        self._pending = None
        obs = (
            np.asarray(self._jit_render(out.render))
            if self.render_obs else None
        )
        metrics = np.asarray(out.metrics)
        rewards = np.asarray(out.reward)
        dones = np.asarray(out.done)
        infos = []
        raw = {k: np.asarray(v) for k, v in out.info.items()}
        for i in range(self.num_envs):
            info: Dict = {k: v[i].item() for k, v in raw.items()}
            info["route_id"] = int(self._route_ids[i])
            if dones[i]:
                info["episode"] = {
                    "r": info["episode_reward"],
                    "l": info["episode_length"],
                }
            infos.append(info)
        return obs, metrics, rewards, dones, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def close(self):
        pass
