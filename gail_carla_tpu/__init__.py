"""gail_carla_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the
capabilities of gustavokcouto/gail-carla.

The reference trains a CARLA driving policy with WDGAIL (Wasserstein GAIL) +
PPO (+ optional BC regularization), with N CARLA servers reached over TCP from
subprocess env workers. Here the *entire* stack — world dynamics, sensors,
traffic, criteria, expert autopilot, discriminator, PPO — is pure JAX:

- one world = one immutable pytree (``sim.state.WorldState``); ``sim.env.step``
  is a pure function; ``jax.vmap`` over worlds replaces SubprocVecEnv
  (reference ``vec_env/subproc_vec_env.py``);
- multi-chip scale-out = ``jax.sharding.Mesh`` + ``pjit`` over the env axis
  (replaces the host/port lists in ``params_variable.json:15-26``);
- the BEV observation (reference ``carla_gym/core/obs_manager/birdview/
  chauffeurnet.py``) is rendered on-device from precompiled map textures;
- rollout, reward relabel, GAE, discriminator and PPO updates fuse into one
  jitted train step (replaces ``tools/learn.py``).
"""

__version__ = "0.1.0"
