import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.sim import transforms as T


def test_gps_roundtrip():
    xy = jnp.array([[338.7, 226.75], [-12.0, 45.0], [0.0, 0.0]])
    back = T.gps_to_location(T.location_to_gps(xy))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-3)


def test_gps_scale_matches_reference_formula():
    # lon of x=300 m: 300*180/(pi*R) (route_manipulation.py:25)
    gps = T.location_to_gps(jnp.array([300.0, 0.0]))
    assert abs(float(gps[1]) - 300.0 * 180.0 / (np.pi * T.EARTH_RADIUS_EQUA)) < 1e-8
    assert abs(float(gps[0])) < 1e-9


def test_frame_roundtrip():
    pts = jnp.array([[3.0, 4.0], [-1.0, 0.5]])
    ref_loc = jnp.array([10.0, -2.0])
    yaw = jnp.array(0.7)
    local = T.loc_global_to_ref(pts, ref_loc, yaw)
    back = T.loc_ref_to_global(local, ref_loc, yaw)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_forward_point_is_positive_x_in_ego_frame():
    # A point straight ahead of a vehicle heading yaw has +x, 0 y.
    yaw = jnp.array(1.1)
    ahead = jnp.array([np.cos(1.1), np.sin(1.1)]) * 5.0
    local = T.vec_global_to_ref(ahead, yaw)
    np.testing.assert_allclose(np.asarray(local), [5.0, 0.0], atol=1e-5)


def test_cast_angle():
    assert abs(float(T.cast_angle(jnp.array(3 * np.pi))) - (-np.pi)) < 1e-6
    assert abs(float(T.cast_angle(jnp.array(-0.1))) - (-0.1)) < 1e-7
