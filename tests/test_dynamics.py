"""Physics envelope regression (VERDICT round-1 item #10).

Pins the bicycle model's constant-input step responses as golden values so
any drift of ``VehicleParams`` (sim/dynamics.py:44-60) fails loudly, and
checks the envelope against CARLA's observable behaviour for the hero
vehicle class (Lincoln MKZ, ``actors.json`` model vehicle.lincoln.mkz2017):

- full-throttle launch: CARLA UE4 vehicles of this class reach ~30 km/h
  (8.3 m/s) about 3 s after a standing start and top out well under
  30 m/s in town driving.
- turning circle: the real MKZ's curb-to-curb circle is 11.4 m diameter
  (≈5.7 m radius at the outer front wheel; the CoM path is tighter). The
  kinematic model with 35° column lock and 2.9 m wheelbase gives ≈4.4 m
  at the CoM — within the same envelope.
- braking: CARLA full brake decelerates at roughly 0.8-1 g.
"""
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.sim.dynamics import (
    DEFAULT_VEHICLE, VehicleState, step_vehicle,
)


def _rest():
    return VehicleState(
        xy=jnp.zeros(2), yaw=jnp.zeros(()), speed=jnp.zeros(())
    )


def test_full_throttle_step_response_golden():
    """Golden regression: throttle 1.0 from rest, v at 1/3/5/10 s."""
    st = _rest()
    vs = []
    for _ in range(100):
        st = step_vehicle(st, 0.0, 1.0, 0.0)
        vs.append(float(st.speed))
    got = np.array([vs[9], vs[29], vs[49], vs[99]])
    golden = np.array([3.4873, 9.0109, 12.8038, 17.3509])
    np.testing.assert_allclose(got, golden, rtol=2e-3)
    # envelope: ~30 km/h at 3 s, monotonic, below max_speed
    assert 7.0 < vs[29] < 11.0
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    assert vs[-1] < DEFAULT_VEHICLE.max_speed


def test_full_lock_turning_radius():
    """Full-lock circle: CoM path radius ≈4.4 m (golden), inside the
    MKZ's 5.7 m curb radius envelope."""
    st = VehicleState(
        xy=jnp.zeros(2), yaw=jnp.zeros(()), speed=jnp.asarray(5.0)
    )
    pts = []
    for _ in range(200):
        st = step_vehicle(st, 1.0, 0.3, 0.0)
        pts.append(np.asarray(st.xy))
    pts = np.array(pts)
    c = pts.mean(axis=0)
    r = np.linalg.norm(pts - c, axis=1)
    np.testing.assert_allclose(r.mean(), 4.38, rtol=0.02)   # golden
    assert 3.5 < r.mean() < 6.5                              # envelope
    # kinematic model: radius is speed-invariant → near-circular path
    assert (r.max() - r.min()) < 0.6


def test_full_brake_stopping_distance():
    """Full brake from 10 m/s: stop in ≈5.5 m / 1.2 s (≈0.85 g)."""
    st = VehicleState(
        xy=jnp.zeros(2), yaw=jnp.zeros(()), speed=jnp.asarray(10.0)
    )
    dist, steps = 0.0, 0
    for _ in range(60):
        x0 = np.asarray(st.xy)
        st = step_vehicle(st, 0.0, 0.0, 1.0)
        dist += float(np.linalg.norm(np.asarray(st.xy) - x0))
        steps += 1
        if float(st.speed) == 0.0:
            break
    np.testing.assert_allclose(dist, 5.52, rtol=0.02)        # golden
    assert 4.0 < dist < 8.0                                   # envelope
    assert steps <= 15
    assert float(st.speed) == 0.0


def test_coast_down():
    """Engine braking + drag: zero-throttle coast from 10 m/s roughly
    halves speed in 5 s (UE4 vehicles coast down noticeably)."""
    st = VehicleState(
        xy=jnp.zeros(2), yaw=jnp.zeros(()), speed=jnp.asarray(10.0)
    )
    for _ in range(50):
        st = step_vehicle(st, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(float(st.speed), 5.5388, rtol=2e-3)
    assert 4.0 < float(st.speed) < 7.0


def test_no_reverse():
    """Brake at rest must not produce reverse motion (no reverse gear in
    the task's action space, carla_env.py:93-94)."""
    st = _rest()
    for _ in range(10):
        st = step_vehicle(st, 0.3, 0.0, 1.0)
    assert float(st.speed) == 0.0
    np.testing.assert_allclose(np.asarray(st.xy), np.zeros(2), atol=1e-6)
