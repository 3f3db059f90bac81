"""Gym-style single-env wrapper — the ``CarlaEnv`` drop-in
(``carla_env.py:81-174``): host-facing numpy API over the jitted sim.

reset() -> (obs, metrics); step(action) -> (obs, metrics, reward, done,
info). obs is the (3, W, W) float BEV (mask 0), metrics the 4-vector
[target lat, target lon, speed, command]. With ``obs_dict=True`` the obs
is instead the reference's FULL per-hero ObsManager dict
(``sim/observations.py::observe_full`` — actor_state / navigation /
object_finder / optional birdview, the CarlaMultiAgentEnv surface from
``carla_multi_agent_env.py:104-116``). Internally one jitted step per
call; for throughput use TpuVecEnv or the fused rollout in algo/.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional

import numpy as np

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.envs.spaces import Box
from gail_carla_tpu.scene.scene import StaticScene


class DrivingEnv:
    def __init__(
        self,
        scene: StaticScene,
        env_cfg: EnvConfig,
        tasks: Optional[List[Dict]] = None,
        route_id: int = 0,
        seed: int = 2021,
        shuffle_tasks: bool = True,
        obs_dict: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from gail_carla_tpu.ops.bev import render_bev
        from gail_carla_tpu.sim import env as sim_env
        from gail_carla_tpu.sim.observations import observe_full

        self.scene = scene
        self.cfg = env_cfg
        self.tasks = tasks or [
            {"route_id": route_id, "weather": "ClearNoon",
             "n_npc_vehicles": env_cfg.n_npc_vehicles,
             "n_npc_walkers": env_cfg.n_npc_walkers}
        ]
        self._task_idx = 0
        self._shuffle = shuffle_tasks
        self._py_rng = random.Random(seed)
        self._rng = jax.random.PRNGKey(seed)
        self._state = None

        w = env_cfg.bev_width
        self.action_space = Box(-10.0, 10.0, (2,))          # carla_env.py:93
        self.observation_space = Box(0.0, 1.0, (3, w, w))
        self.metrics_space = Box(-100.0, 100.0, (4,))

        self._jit_reset = jax.jit(
            lambda k, r: sim_env.observe(
                scene, env_cfg, sim_env.reset_env(scene, env_cfg, k, r)
            )
        )
        self._jit_step = jax.jit(
            lambda s, a: sim_env.step_env(scene, env_cfg, s, a)
        )
        self._jit_render = jax.jit(
            lambda r: render_bev(
                scene, env_cfg, r.xy, r.yaw, r.route_id, r.head
            )
        )
        self._obs_dict = obs_dict
        self._jit_full = (
            jax.jit(lambda s: observe_full(scene, env_cfg, s))
            if obs_dict else None
        )
        self._jax = jax
        self._jnp = jnp

    # -- CarlaMultiAgentEnv.set_task_idx (carla_multi_agent_env.py:52) --
    def set_task_idx(self, task_idx: int):
        self._task_idx = task_idx % len(self.tasks)

    @property
    def task(self) -> Dict:
        return self.tasks[self._task_idx]

    @property
    def route_completed(self) -> bool:
        return bool(self._last_info.get("route_completed", False))

    def reset(self):
        from gail_carla_tpu.sim.weather import make_weather

        if self._shuffle and len(self.tasks) > 1:
            self._task_idx = self._py_rng.randrange(len(self.tasks))
        self._rng, k = self._jax.random.split(self._rng)
        route_id = self._jnp.asarray(self.task["route_id"], self._jnp.int32)
        self._state, metrics, render = self._jit_reset(k, route_id)
        obs = self._observe(render)
        self._last_info = {}
        self.episode_reward = 0.0
        # WeatherHandler.reset semantics (dynamic_weather.py:89-106);
        # evolved on host per step — weather is visual-only metadata.
        self._weather_params = make_weather(
            self.task.get("weather", "ClearNoon"), self._py_rng
        )
        self._sim_t = 0.0
        return obs, np.asarray(metrics)

    @property
    def weather(self):
        """``world.get_weather()``: the current Weather struct (numpy
        scalars), evolved to the episode's elapsed sim time."""
        from gail_carla_tpu.sim.weather import weather_at

        return weather_at(self._weather_params, self._sim_t, xp=np)

    def _observe(self, render):
        if self._obs_dict:
            return self._jax.tree.map(
                np.asarray, self._jit_full(self._state)
            )
        return np.asarray(self._jit_render(render))

    def step(self, action):
        assert self._state is not None, "call reset() first"
        action = self._jnp.asarray(np.asarray(action, np.float32))
        self._state, out = self._jit_step(self._state, action)
        obs = self._observe(out.render)
        metrics = np.asarray(out.metrics)
        reward = float(out.reward)
        done = bool(out.done)
        self.episode_reward += reward
        info = {k: np.asarray(v).item() for k, v in out.info.items()}
        info["route_id"] = self.task["route_id"]
        info["episode_reward"] = self.episode_reward
        # weather tick + the sun-angle headlight rule
        # (task_vehicle.py:175-181) — host-side, no device round-trip
        from gail_carla_tpu.sim.weather import headlights_on, weather_at

        self._sim_t += self.cfg.dt
        w = weather_at(self._weather_params, self._sim_t, xp=np)
        info["sun_altitude_angle"] = float(w.sun_altitude_angle)
        info["vehicle_lights_on"] = bool(headlights_on(w))
        if done:
            info["episode"] = {
                "r": self.episode_reward, "l": info["episode_length"]
            }
            self.episode_reward = 0.0
        self._last_info = info
        return obs, metrics, reward, done, info

    def close(self):
        pass
