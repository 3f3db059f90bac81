"""2D rigid-frame geometry, in jnp, batched-by-construction.

TPU-native counterpart of the reference's ``carla_gym/utils/transforms.py``
(loc/vec global<->ego-frame, ``cast_angle``) and of the Web-Mercator GPS
conversions in ``carla_gym/core/task_actor/common/navigation/
route_manipulation.py:20-44``.

Conventions: positions are metres in the world frame (x east, y "CARLA south",
matching the reference's left-handed world seen from above), ``yaw`` is
radians (the reference uses degrees; we convert at the config boundary).
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

EARTH_RADIUS_EQUA = 6378137.0  # route_manipulation.py:20


def cast_angle(theta):
    """Wrap angle to [-pi, pi). Reference: transforms.py ``cast_angle``
    (degrees, [-180, 180)); ours is radians."""
    return jnp.mod(theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def rot2d(yaw):
    """Rotation matrix mapping ego-frame vectors to the world frame.

    forward = (cos yaw, sin yaw), right = (-sin yaw, cos yaw) rotated..., i.e.
    world = R @ local with R = [[c, -s], [s, c]].
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def vec_global_to_ref(vec, ref_yaw):
    """Express a world-frame 2D vector in a frame rotated by ``ref_yaw``.

    Counterpart of transforms.py ``vec_global_to_ref`` (there via a full
    3D rotation matrix; flat-world 2D here).
    """
    c, s = jnp.cos(ref_yaw), jnp.sin(ref_yaw)
    x = vec[..., 0] * c + vec[..., 1] * s
    y = -vec[..., 0] * s + vec[..., 1] * c
    return jnp.stack([x, y], axis=-1)


def vec_ref_to_global(vec, ref_yaw):
    c, s = jnp.cos(ref_yaw), jnp.sin(ref_yaw)
    x = vec[..., 0] * c - vec[..., 1] * s
    y = vec[..., 0] * s + vec[..., 1] * c
    return jnp.stack([x, y], axis=-1)


def loc_global_to_ref(loc, ref_loc, ref_yaw):
    """World point -> ego frame (transforms.py ``loc_global_to_ref``)."""
    return vec_global_to_ref(loc - ref_loc, ref_yaw)


def loc_ref_to_global(loc, ref_loc, ref_yaw):
    return vec_ref_to_global(loc, ref_yaw) + ref_loc


def location_to_gps(xy):
    """World metres -> (lat, lon) degrees, Web-Mercator at the equator.

    Matches route_manipulation.py:23-29 (the variant actually used by the
    GNSS obs manager / leaderboard plan): lon from x, lat from -y.
    """
    lon = xy[..., 0] * 180.0 / (jnp.pi * EARTH_RADIUS_EQUA)
    # Reference formula: 360*atan(exp(-y/R))/pi - 90. Near the towns' scale
    # (|y| ~ 1e2 m) that subtracts two ~90 values and loses all float32
    # precision, so we use the equivalent Gudermannian form
    # atan(exp(u)) - pi/4 == atan(tanh(u/2)), exact in the reals.
    lat = (
        360.0
        / jnp.pi
        * jnp.arctan(jnp.tanh(-xy[..., 1] / (2.0 * EARTH_RADIUS_EQUA)))
    )
    return jnp.stack([lat, lon], axis=-1)


def gps_to_location(latlon):
    """(lat, lon) degrees -> world metres (route_manipulation.py:32-44)."""
    lat = latlon[..., 0]
    lon = latlon[..., 1]
    x = lon / 180.0 * (jnp.pi * EARTH_RADIUS_EQUA)
    # Stable inverse of the Gudermannian form above:
    # -R*log(tan((lat+90)*pi/360)) == -2R*artanh(tan(lat*pi/360)).
    y = -2.0 * EARTH_RADIUS_EQUA * jnp.arctanh(jnp.tan(lat * jnp.pi / 360.0))
    return jnp.stack([x, y], axis=-1)
