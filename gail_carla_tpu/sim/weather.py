"""Dynamic weather — closed-form port of ``carla_gym/utils/dynamic_weather.py``.

The reference evolves weather with two stateful host objects ticked every
frame: ``Sun`` (dynamic_weather.py:34-48 — phase ``t += 0.008*dt``,
``altitude = 70*sin(t) - 20``, ``azimuth += 0.25*dt``) and ``Storm``
(dynamic_weather.py:51-81 — a +-1.3/s triangle wave of an internal ``_t``
clamped to [-250, 100], from which clouds/rain/puddles/wetness/wind/fog
are piecewise-linear readouts). ``WeatherHandler`` (ibid.:84-127) picks a
random preset from the 14-entry pool for ``cfg_weather='dynamic[_speed]'``
or pins a named preset otherwise; ``task_vehicle.py:175-181`` turns the
ego's headlights on whenever ``sun_altitude_angle < 0``.

TPU-first design: instead of per-step mutable handlers, the entire
trajectory is the CLOSED FORM of those recurrences — ``weather_at(params,
t_seconds)`` is a pure jnp function of elapsed sim time (the sun phase is
linear in t; the clamped storm walk is an exact triangle wave), so weather
needs no carried state, no scan, and vmaps over per-env parameters for
free. Deviation from the reference's discrete tick: the reference discards
the overshoot when ``_t`` clamps at a rail (one tick's worth, <=1.3*dt per
half-cycle of 269 s) — a bounded phase drift the parity test accounts for.

Weather is visual-only in both stacks: the policy obs (BEV masks) and
dynamics are weather-invariant, and the reference never instantiates the
handler (carla_multi_agent_env.py:71-72 comments it out). It is exposed
here as env info / camera lighting so the surface exists and actually
runs.
"""
from __future__ import annotations

import math
import random
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# CARLA's stock presets (the public WeatherParameters constants), as
# (cloudiness, precipitation, precipitation_deposits, wind_intensity,
#  sun_azimuth_angle, sun_altitude_angle). Only azimuth + precipitation
# seed the DYNAMIC evolution (Sun.__init__/Storm.__init__); the rest is
# what a pinned preset reports.
PRESETS = {
    "ClearNoon": (15.0, 0.0, 0.0, 0.35, 0.0, 75.0),
    "ClearSunset": (15.0, 0.0, 0.0, 0.35, 0.0, 15.0),
    "CloudyNoon": (80.0, 0.0, 0.0, 0.35, 0.0, 75.0),
    "CloudySunset": (80.0, 0.0, 0.0, 0.35, 0.0, 15.0),
    "WetNoon": (20.0, 0.0, 50.0, 0.35, 0.0, 75.0),
    "WetSunset": (20.0, 0.0, 50.0, 0.35, 0.0, 15.0),
    "MidRainyNoon": (80.0, 30.0, 50.0, 0.40, 0.0, 75.0),
    "MidRainSunset": (80.0, 30.0, 50.0, 0.40, 0.0, 15.0),
    "WetCloudyNoon": (80.0, 0.0, 50.0, 0.35, 0.0, 75.0),
    "WetCloudySunset": (80.0, 0.0, 50.0, 0.35, 0.0, 15.0),
    "HardRainNoon": (90.0, 60.0, 100.0, 1.0, 0.0, 75.0),
    "HardRainSunset": (90.0, 60.0, 100.0, 1.0, 0.0, 15.0),
    "SoftRainNoon": (70.0, 15.0, 50.0, 0.35, 0.0, 75.0),
    "SoftRainSunset": (70.0, 15.0, 50.0, 0.35, 0.0, 15.0),
}

# WeatherHandler.reset's dynamic pool (dynamic_weather.py:6-27) — the
# Noon/Sunset pairs of the 7 base conditions, in the reference's order.
DYNAMIC_POOL = list(PRESETS)


@struct.dataclass
class WeatherParams:
    """Per-env weather parameterisation. ``dynamic`` is a 0/1 float mask
    (so the struct stays a uniform pytree under vmap): 0 -> ``static``
    is reported verbatim; 1 -> the closed-form evolution runs from
    (sun_t0, az0, storm_t0) at ``speed`` x real time."""
    dynamic: jnp.ndarray      # () f32, 0.0 or 1.0
    speed: jnp.ndarray        # () f32, the 'dynamic_<speed>' factor
    sun_t0: jnp.ndarray       # () f32, Sun._t ~ U(0, 2pi)
    az0: jnp.ndarray          # () f32, preset sun azimuth
    storm_t0: jnp.ndarray     # () f32, Storm._t at t=0
    static: jnp.ndarray       # (6,) f32, the pinned preset row


@struct.dataclass
class Weather:
    """What ``world.get_weather()`` reports (the fields Storm/Sun drive,
    dynamic_weather.py:113-121)."""
    cloudiness: jnp.ndarray
    precipitation: jnp.ndarray
    precipitation_deposits: jnp.ndarray
    wind_intensity: jnp.ndarray
    fog_density: jnp.ndarray
    wetness: jnp.ndarray
    sun_azimuth_angle: jnp.ndarray
    sun_altitude_angle: jnp.ndarray


def make_weather(
    cfg_weather: str, py_rng: Optional[random.Random] = None
) -> WeatherParams:
    """WeatherHandler.reset (dynamic_weather.py:89-106): a preset name
    pins that preset; ``'dynamic'`` / ``'dynamic_<speed>'`` samples a
    pool preset and evolves it. Unknown names fall back to ClearNoon.

    Leaves are host numpy scalars: ``weather_at(..., xp=np)`` then runs
    entirely on the host (DrivingEnv info at ~zero cost — a per-step
    device call would cost a full tunnel RPC); jit users convert with
    ``jax.tree.map(jnp.asarray, wp)`` and ``xp=jnp``."""
    py_rng = py_rng or random.Random(0)
    f = lambda v: np.asarray(v, np.float32)
    if cfg_weather in PRESETS:
        row = PRESETS[cfg_weather]
        return WeatherParams(
            dynamic=f(0.0), speed=f(0.0),
            sun_t0=f(0.0), az0=f(row[4]),
            storm_t0=f(0.0), static=f(row),
        )
    if "dynamic" in cfg_weather:
        row = PRESETS[py_rng.choice(DYNAMIC_POOL)]
        parts = cfg_weather.split("_")
        speed = float(parts[1]) if len(parts) == 2 else 1.0
        precip = row[1]
        return WeatherParams(
            dynamic=f(1.0), speed=f(speed),
            sun_t0=f(py_rng.uniform(0.0, 2.0 * math.pi)),
            az0=f(row[4]),
            storm_t0=f(precip if precip > 0.0 else -50.0),
            static=f(row),
        )
    return make_weather("ClearNoon", py_rng)


def weather_at(wp: WeatherParams, t_seconds, xp=jnp) -> Weather:
    """Closed form of Sun.tick/Storm.tick after ``t_seconds`` of sim time
    (x ``wp.speed``), including the reference's priming ``tick(0.1)`` at
    reset (dynamic_weather.py:103). ``xp`` picks the backend: jnp inside
    jit/vmap, np for host-side info plumbing."""
    s = (xp.asarray(t_seconds, xp.float32) + 0.1) * wp.speed

    # Sun (dynamic_weather.py:41-45)
    t_sun = wp.sun_t0 + 0.008 * s
    altitude = 70.0 * xp.sin(t_sun) - 20.0
    azimuth = xp.mod(wp.az0 + 0.25 * s, 360.0)

    # Storm (dynamic_weather.py:62-75): _t walks +-1.3/s between the
    # rails -250 and 100 -> an exact triangle wave of period 700/1.3 s
    # in walk-distance units, phase anchored at storm_t0 ascending.
    pos = xp.mod(wp.storm_t0 + 250.0 + 1.3 * s, 700.0)
    storm_t = xp.where(pos <= 350.0, pos, 700.0 - pos) - 250.0
    increasing = pos <= 350.0

    clip = lambda v, lo, hi: xp.clip(v, lo, hi)
    clouds = clip(storm_t + 40.0, 0.0, 90.0)
    rain = clip(storm_t, 0.0, 80.0)
    delay = xp.where(increasing, -10.0, 90.0)
    puddles = clip(storm_t + delay, 0.0, 85.0)
    wetness = clip(storm_t * 5.0, 0.0, 100.0)
    wind = xp.where(
        clouds <= 20.0, 5.0, xp.where(clouds >= 70.0, 90.0, 40.0)
    )
    fog = clip(storm_t - 10.0, 0.0, 30.0)

    st = wp.static
    d = wp.dynamic
    mix = lambda dyn, fixed: d * dyn + (1.0 - d) * fixed
    return Weather(
        cloudiness=mix(clouds, st[0]),
        precipitation=mix(rain, st[1]),
        precipitation_deposits=mix(puddles, st[2]),
        wind_intensity=mix(wind, st[3]),
        fog_density=mix(fog, 0.0),
        wetness=mix(wetness, 0.0),
        sun_azimuth_angle=mix(azimuth, st[4]),
        sun_altitude_angle=mix(altitude, st[5]),
    )


def headlights_on(weather: Weather) -> jnp.ndarray:
    """task_vehicle.py:175-181: Position|LowBeam whenever the sun is
    below the horizon, NONE otherwise."""
    return weather.sun_altitude_angle < 0.0


def sun_brightness(weather: Weather) -> jnp.ndarray:
    """Ambient light factor for the flat-shaded camera (ops/camera.py):
    1.0 at high noon, ~0.25 under a below-horizon sun (the UE4 renderer's
    day/night swing, approximated as a smooth ramp on sun altitude)."""
    alt = weather.sun_altitude_angle
    return 0.25 + 0.75 * jnp.clip(alt / 60.0, 0.0, 1.0)
