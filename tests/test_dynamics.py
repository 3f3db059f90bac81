import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.sim.dynamics import (
    DEFAULT_VEHICLE, VehicleState, step_vehicle,
)


def make_state(x=0.0, y=0.0, yaw=0.0, v=0.0):
    return VehicleState(
        xy=jnp.array([x, y]), yaw=jnp.array(yaw), speed=jnp.array(v)
    )


def test_straight_accel_reaches_expert_speed():
    """Full throttle from rest should cross the expert's 6 m/s target
    (carla_exp.py:49) within a few seconds, like a real sedan."""
    s = make_state()
    step = jax.jit(lambda st: step_vehicle(st, 0.0, 1.0, 0.0))
    for _ in range(50):  # 5 s
        s = step(s)
    assert float(s.speed) > 6.0
    assert float(s.xy[1]) == 0.0  # no lateral drift going straight
    assert float(s.xy[0]) > 20.0


def test_terminal_speed_bounded():
    s = make_state(v=0.0)
    step = jax.jit(lambda st: step_vehicle(st, 0.0, 1.0, 0.0))
    for _ in range(600):
        s = step(s)
    assert float(s.speed) < DEFAULT_VEHICLE.max_speed


def test_brake_stops():
    s = make_state(v=10.0)
    step = jax.jit(lambda st: step_vehicle(st, 0.0, 0.0, 1.0))
    for _ in range(30):
        s = step(s)
    assert float(s.speed) == 0.0


def test_right_steer_increases_yaw():
    """CARLA's left-handed convention: positive steer = right turn =
    increasing yaw (see scene/town.py conventions)."""
    s = make_state(v=5.0)
    for _ in range(10):
        s = step_vehicle(s, 0.5, 0.5, 0.0)
    assert float(s.yaw) > 0.05
    assert float(s.xy[1]) > 0.0


def test_turn_radius_matches_bicycle_geometry():
    """At constant speed and steer, the path is a circle with
    R = wheelbase / tan(delta) (rear-axle approx; we check within 20%)."""
    p = DEFAULT_VEHICLE
    steer = 0.4
    delta = steer * p.max_steer
    s = make_state(v=5.0)
    xs, ys = [], []
    step = jax.jit(lambda st: step_vehicle(st, steer, 0.32, 0.0))
    for _ in range(400):
        s = step(s)
        xs.append(float(s.xy[0]))
        ys.append(float(s.xy[1]))
    xs, ys = np.array(xs), np.array(ys)
    cx, cy = xs.mean(), ys.mean()
    radii = np.hypot(xs - cx, ys - cy)
    expected = p.wheelbase / np.tan(delta)
    assert abs(radii.mean() - expected) / expected < 0.2
    assert radii.std() / radii.mean() < 0.1  # actually a circle


def test_vmap_batch_consistency():
    """SURVEY.md §4(c): one env must equal the batch slice."""
    batch = VehicleState(
        xy=jnp.array([[0.0, 0.0], [5.0, 1.0]]),
        yaw=jnp.array([0.0, 0.3]),
        speed=jnp.array([2.0, 7.0]),
    )
    steer = jnp.array([0.1, -0.2])
    throttle = jnp.array([0.9, 0.0])
    stepped = jax.vmap(
        lambda st, a, t: step_vehicle(st, a, t, 0.0)
    )(batch, steer, throttle)
    single = step_vehicle(
        VehicleState(xy=batch.xy[1], yaw=batch.yaw[1], speed=batch.speed[1]),
        steer[1], throttle[1], 0.0,
    )
    np.testing.assert_allclose(
        np.asarray(stepped.xy[1]), np.asarray(single.xy), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(stepped.yaw[1]), float(single.yaw), rtol=1e-6
    )
