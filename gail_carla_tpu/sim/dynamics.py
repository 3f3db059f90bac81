"""Vehicle dynamics: kinematic bicycle model at the reference's 10 Hz tick.

The reference delegates physics to the external CARLA 0.9.10 server (UE4
rigid-body, ticked synchronously with ``fixed_delta_seconds = 0.1`` —
``carla_gym/carla_multi_agent_env.py:170-176``). This module is the TPU-native
replacement: a kinematic bicycle with a simple engine/drag longitudinal model,
tuned to the operating envelope the learner actually visits (expert target
speed 6 m/s — ``carla_exp.py:49``; controls are steer in [-1, 1] and throttle
in [0, 1] — ``carla_env.py:93-94,120-126``).

Pure functions over ``VehicleState``; everything vmaps over envs and over
traffic agents within an env.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from gail_carla_tpu.sim.transforms import cast_angle


@struct.dataclass
class VehicleState:
    """Minimal rigid-vehicle state. Batched over leading dims by vmap."""

    xy: jnp.ndarray        # (2,) world position, metres
    yaw: jnp.ndarray       # () heading, radians
    speed: jnp.ndarray     # () forward speed, m/s (signed; >= 0 in practice)

    @property
    def vel(self):
        """World-frame planar velocity (m/s). The reference reads
        ``vehicle.get_velocity()`` (e.g. ``criteria/blocked.py:13``); with a
        no-slip bicycle this is speed * heading."""
        return self.speed[..., None] * jnp.stack(
            [jnp.cos(self.yaw), jnp.sin(self.yaw)], axis=-1
        )


@dataclasses.dataclass(frozen=True)
class VehicleParams:
    """Static physical parameters (Lincoln MKZ-class hero vehicle)."""

    wheelbase: float = 2.9        # m, front-rear axle distance
    lr: float = 1.45              # m, CoM to rear axle
    max_steer: float = 0.6109     # rad, full steering-column deflection (35°)
    max_accel: float = 3.8        # m/s^2, full-throttle accel at v = 0
    max_brake: float = 8.0        # m/s^2
    max_speed: float = 30.0       # m/s, engine power fades linearly to here
    roll_drag: float = 0.08       # m/s^2, constant rolling resistance
    quad_drag: float = 0.0035     # 1/m, aerodynamic term (a -= quad*v^2)
    engine_brake: float = 0.6     # m/s^2 at zero throttle (UE4 vehicles
                                  # coast down noticeably; scaled by 1-throttle)
    half_length: float = 2.45     # m, bounding-box half extent x
    half_width: float = 1.06      # m, bounding-box half extent y
    substeps: int = 4             # Euler substeps per 0.1 s tick


DEFAULT_VEHICLE = VehicleParams()


def step_vehicle(
    state: VehicleState,
    steer: jnp.ndarray,
    throttle: jnp.ndarray,
    brake: jnp.ndarray,
    dt: float = 0.1,
    params: VehicleParams = DEFAULT_VEHICLE,
) -> VehicleState:
    """Advance one sim tick (default 0.1 s, matching
    ``carla_multi_agent_env.py:173``).

    Controls mirror ``carla.VehicleControl``: steer [-1, 1], throttle [0, 1],
    brake [0, 1] (``carla_env.py:120-126`` drives only steer+throttle; the
    multi-agent action space also carries brake,
    ``carla_multi_agent_env.py:42-46``).
    """
    steer = jnp.clip(steer, -1.0, 1.0)
    throttle = jnp.clip(throttle, 0.0, 1.0)
    brake = jnp.clip(brake, 0.0, 1.0)

    delta = steer * params.max_steer
    # Side-slip angle of a kinematic bicycle, CoM reference point.
    beta = jnp.arctan(params.lr / params.wheelbase * jnp.tan(delta))

    h = dt / params.substeps
    xy, yaw, v = state.xy, state.yaw, state.speed
    for _ in range(params.substeps):
        accel = (
            throttle * params.max_accel * (1.0 - v / params.max_speed)
            - brake * params.max_brake
            - (1.0 - throttle) * params.engine_brake * jnp.sign(v)
            - params.roll_drag * jnp.sign(v)
            - params.quad_drag * v * jnp.abs(v)
        )
        v = jnp.maximum(v + accel * h, 0.0)  # no reverse gear in the task
        course = yaw + beta
        xy = xy + h * v * jnp.stack([jnp.cos(course), jnp.sin(course)], axis=-1)
        yaw = cast_angle(yaw + h * v / params.lr * jnp.sin(beta))

    return VehicleState(xy=xy, yaw=yaw, speed=v)
