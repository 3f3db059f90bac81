"""Dynamic weather (sim/weather.py) vs the reference's stateful
Sun/Storm recurrences (carla_gym/utils/dynamic_weather.py:34-81), plus
the sun-angle headlight rule (task_vehicle.py:175-181) and the camera
ambient tie-in."""
import math
import random

import numpy as np
import pytest

from gail_carla_tpu.sim import weather as wx


def _reference_tick_loop(sun_t0, az0, precip, speed, dt, n_steps):
    """The reference recurrences, run step by step (the semantics our
    closed form must match): Sun.tick + Storm.tick per frame."""
    sun_t, az = sun_t0, az0
    storm_t = precip if precip > 0.0 else -50.0
    increasing = True
    rows = []
    # WeatherHandler.reset primes with tick(0.1); then one tick per frame
    deltas = [0.1] + [dt] * n_steps
    for d in deltas:
        ds = d * speed
        sun_t = (sun_t + 0.008 * ds) % (2.0 * math.pi)
        az = (az + 0.25 * ds) % 360.0
        alt = 70.0 * math.sin(sun_t) - 20.0
        delta = (1.3 if increasing else -1.3) * ds
        storm_t = max(-250.0, min(storm_t + delta, 100.0))
        clouds = max(0.0, min(storm_t + 40.0, 90.0))
        rain = max(0.0, min(storm_t, 80.0))
        delay = -10.0 if increasing else 90.0
        puddles = max(0.0, min(storm_t + delay, 85.0))
        wetness = max(0.0, min(storm_t * 5.0, 100.0))
        wind = 5.0 if clouds <= 20 else 90.0 if clouds >= 70 else 40.0
        fog = max(0.0, min(storm_t - 10.0, 30.0))
        if storm_t == -250.0:
            increasing = True
        if storm_t == 100.0:
            increasing = False
        rows.append((alt, az, clouds, rain, puddles, wetness, wind, fog))
    return np.asarray(rows)


def test_closed_form_matches_reference_recurrence():
    """weather_at(t) == the reference's per-frame tick loop at the same
    elapsed time, over 4+ storm half-cycles (the clamp discards <=
    1.3*dt of overshoot per rail hit — tolerance covers that bounded
    phase drift; wind/puddle step functions are compared away from
    their thresholds where a sub-unit phase shift flips the output)."""
    dt, n = 0.1, 20000  # 2000 s of sim time at speed 1.0
    sun_t0, az0, precip, speed = 1.234, 42.0, 30.0, 1.0
    ref = _reference_tick_loop(sun_t0, az0, precip, speed, dt, n)

    wp = wx.WeatherParams(
        dynamic=np.float32(1.0), speed=np.float32(speed),
        sun_t0=np.float32(sun_t0), az0=np.float32(az0),
        storm_t0=np.float32(precip), static=np.zeros(6, np.float32),
    )
    # rail hits in 2000 s: ~7 -> worst-case phase drift ~7*0.13 = 0.9
    t = np.arange(1, n + 1) * dt  # ref row i+1 is after i frame ticks
    w = wx.weather_at(wp, t, xp=np)
    got = ref[1:]
    assert np.allclose(w.sun_altitude_angle, got[:, 0], atol=1e-3)
    d_az = np.abs(np.asarray(w.sun_azimuth_angle) - got[:, 1])
    assert np.minimum(d_az, 360.0 - d_az).max() < 1e-3  # circular
    for k, name in ((2, "cloudiness"), (3, "precipitation"),
                    (5, "wetness"), (7, "fog_density")):
        vals = getattr(w, {2: "cloudiness", 3: "precipitation",
                           5: "wetness", 7: "fog_density"}[k])
        scale = 5.0 if k == 5 else 1.0
        assert np.abs(vals - got[:, k]).max() <= 1.5 * scale, name
    # step-function outputs: exact agreement away from the thresholds
    clouds = got[:, 2]
    safe = (np.abs(clouds - 20.0) > 2.0) & (np.abs(clouds - 70.0) > 2.0)
    assert (np.asarray(w.wind_intensity)[safe] == got[safe, 6]).all()
    pud_safe = (got[:, 4] < 83.0) & (  # away from both clip rails and
        np.abs(got[:, 4]) > 2.0        # the increasing-flip jump
    )
    assert np.abs(
        np.asarray(w.precipitation_deposits)[pud_safe] - got[pud_safe, 4]
    ).max() <= 2.0


def test_static_preset_reports_constants_and_headlights():
    wp = wx.make_weather("HardRainSunset")
    w0 = wx.weather_at(wp, 0.0, xp=np)
    w1 = wx.weather_at(wp, 500.0, xp=np)
    assert float(w0.precipitation) == 60.0 == float(w1.precipitation)
    assert float(w0.sun_altitude_angle) == 15.0
    assert not bool(wx.headlights_on(w0))  # sun above horizon
    # a dynamic night: altitude = 70*sin(t)-20 < 0 for sin(t) < 2/7
    night = wx.Weather(*[np.float32(0.0)] * 7, np.float32(-20.0))
    assert bool(wx.headlights_on(night))
    # unknown names fall back to ClearNoon (dynamic_weather.py:104-106)
    assert float(wx.weather_at(
        wx.make_weather("NoSuchWeather"), 0.0, xp=np
    ).sun_altitude_angle) == 75.0


def test_dynamic_parsing_and_pool():
    rng = random.Random(7)
    wp = wx.make_weather("dynamic_2.0", rng)
    assert float(wp.dynamic) == 1.0 and float(wp.speed) == 2.0
    assert float(wx.make_weather("dynamic", rng).speed) == 1.0
    # pool choice is one of the 14 presets' azimuth/precip pairs
    assert any(
        float(wp.static[1]) == row[1] and float(wp.az0) == row[4]
        for row in wx.PRESETS.values()
    )
    # sun phase is randomised per reset like Sun.__init__
    t0s = {float(wx.make_weather("dynamic", rng).sun_t0)
           for _ in range(4)}
    assert len(t0s) == 4
    assert all(0.0 <= t < 2.0 * math.pi for t in t0s)


def test_camera_brightness_scales_frame():
    import jax.numpy as jnp

    from gail_carla_tpu.ops.camera import render_camera
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=1, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    xy = scene.route_xy[0, 5]
    yaw = scene.route_yaw[0, 5]
    day = np.asarray(render_camera(scene, xy, yaw))
    night_b = wx.sun_brightness(
        wx.Weather(*[np.float32(0.0)] * 7, np.float32(-20.0))
    )
    assert float(night_b) == 0.25
    night = np.asarray(
        render_camera(scene, xy, yaw, brightness=jnp.asarray(night_b))
    )
    assert night.shape == day.shape
    assert night.mean() < 0.35 * day.mean()
    assert (night <= np.ceil(day * 0.2505)).all()


def test_driving_env_reports_weather_info():
    import jax.numpy as jnp

    from gail_carla_tpu.config import EnvConfig
    from gail_carla_tpu.envs.gym_env import DrivingEnv
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(n_routes=1, nx=3, ny=3, block=80.0,
                                 min_length=150.0)
    env = DrivingEnv(
        scene, EnvConfig(train=False),
        tasks=[{"route_id": 0, "weather": "dynamic_50.0",
                "n_npc_vehicles": 0, "n_npc_walkers": 0}],
    )
    env.reset()
    alts = []
    for _ in range(4):
        _, _, _, _, info = env.step(np.zeros(2, np.float32))
        assert isinstance(info["vehicle_lights_on"], bool)
        assert info["vehicle_lights_on"] == (
            info["sun_altitude_angle"] < 0.0
        )
        alts.append(info["sun_altitude_angle"])
    # at speed 50 the sun moves visibly between steps
    assert len(set(alts)) > 1
    w = env.weather
    assert -90.0 <= float(w.sun_altitude_angle) <= 50.0
