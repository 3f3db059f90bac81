"""Expert demo exporter in the reference's on-disk format.

Port of ``carla_exp.py:23-80``: for each route, drive the scripted expert
(with throttle/steer noise) until route completion and write
``gail_experts/<traj>/route_XX/ep_YY/`` containing:
- ``episode.json``: per-step ``actions`` [steer, throttle] and ``metrics``
  [target lat, target lon, speed, command] (pandas-orient columns, as
  pd.DataFrame.to_json produced);
- ``birdview_masks/{step:04d}_{mask:02d}.png``: the 15-channel mask stack
  grouped 3-at-a-time into five RGB PNGs (mask 00 = road/route/lane — the
  only one training reads back, wdgail.py:233-236);
- ``birdview/{step:04d}.png``: the colour-composed BEV;
- ``rgb/ rgb_left/ rgb_right/``: pseudo-camera frames (ops/camera.py — a
  geometric approximation; see its docstring).

On-device training never touches these files (algo/expert.py keeps demos as
arrays); this tool exists for interop with the reference's dataset format.

Usage: python -m gail_carla_tpu.tools.gen_trajectories --out gail_experts \
           [--routes 10] [--max-steps 6000]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np


def save_png(path, arr):
    from PIL import Image

    Image.fromarray(np.asarray(arr)).save(path)


def gen_trajectories(
    out_dir: str = "gail_experts",
    traj_name: str = "routes_training",
    n_routes: int = 10,
    n_eps: int = 1,
    max_steps: int = 6000,
    with_cameras: bool = True,
    scene_kwargs=None,
    compliant: bool = False,
    weather: str = "ClearNoon",
):
    import jax
    import jax.numpy as jnp

    from gail_carla_tpu.agents.autopilot import (
        autopilot_act, make_autopilot,
    )
    from gail_carla_tpu.agents.noiser import (
        apply_steer_noise, apply_throttle_noise, make_noiser, noiser_step,
    )
    from gail_carla_tpu.config import EnvConfig
    from gail_carla_tpu.ops.bev_full import render_bev_full
    from gail_carla_tpu.ops.camera import render_camera
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    kw = dict(scene_kwargs or {})
    if "town" in kw:
        # reconstructed reference town (carla_exp.py runs on Town01)
        from gail_carla_tpu.scene.town_import import make_town_scene

        scene = make_town_scene(**kw)
    else:
        from gail_carla_tpu.scene.scene import make_benchmark_scene

        scene = make_benchmark_scene(**kw)
    cfg = EnvConfig(train=False, full_bev=True)

    step_one = jax.jit(
        lambda st, a: step_batch(scene, cfg, st, a[None])
    )
    render_full = jax.jit(
        lambda r, h: render_bev_full(
            scene, cfg, r.xy, r.yaw, r.route_id, r.head,
            jax.tree.map(lambda a: a[0], h),
        )
    )
    cams = {
        "rgb": 0.0, "rgb_left": math.radians(-55.0),
        "rgb_right": math.radians(55.0),
    }
    import random as py_random

    from gail_carla_tpu.sim.weather import (
        make_weather, sun_brightness, weather_at,
    )

    weather_params = make_weather(weather, py_random.Random(1337))

    def _cam(r, off, traffic, t):
        from gail_carla_tpu.sim import signals

        veh_pose = jnp.concatenate(
            [traffic.veh.xy, traffic.veh.yaw[:, None]], axis=1
        )
        walker_pose = jnp.concatenate(
            [traffic.walker_xy, traffic.walker_yaw[:, None]], axis=1
        )
        w = weather_at(weather_params, t)
        return render_camera(
            scene, r.xy, r.yaw, off, veh_pose=veh_pose,
            walker_pose=walker_pose,
            tl_states=signals.light_states(scene, t),
            brightness=sun_brightness(w),
            sun_altitude=w.sun_altitude_angle,
            sun_azimuth=w.sun_azimuth_angle,
            fog_density=w.fog_density,
        )

    render_cam = jax.jit(_cam)

    root = Path(out_dir) / traj_name
    rng = jax.random.PRNGKey(1337)

    for route_id in range(n_routes):
        for ep_id in range(n_eps):
            ep_dir = root / f"route_{route_id:02d}" / f"ep_{ep_id:02d}"
            for sub in ("rgb", "rgb_left", "rgb_right", "birdview",
                        "birdview_masks"):
                (ep_dir / sub).mkdir(parents=True, exist_ok=True)

            rng, k_r, k_n1, k_n2 = jax.random.split(rng, 4)
            states, metrics, render = reset_batch(
                scene, cfg, k_r, jnp.asarray([route_id], jnp.int32)
            )
            ap = make_autopilot()
            thr_ns = make_noiser(k_n1, 10.0, 2.0)
            st_ns = make_noiser(k_n2, 4.0, 0.5)

            actions_ep, metrics_ep = [], []
            completed = False
            for i_step in range(max_steps):
                w = jax.tree.map(lambda a: a[0], states)
                ap, action = autopilot_act(
                    scene, ap, w, 6.0, obey_signals=compliant
                )
                t = jnp.asarray(i_step * cfg.dt)
                speed_kmh = metrics[0, 2] * 3.6
                rng, k1, k2 = jax.random.split(rng, 3)
                thr_ns, ap_t, nz_t = noiser_step(thr_ns, k1, t, 15.0, 2.0)
                st_ns, ap_s, nz_s = noiser_step(st_ns, k2, t, 25.0, 0.5)
                action = apply_throttle_noise(action, ap_t, nz_t)
                action = apply_steer_noise(action, ap_s, nz_s, speed_kmh)

                # save obs of the current step (pre-action), carla_exp:55-62
                r0 = jax.tree.map(lambda a: a[0], render)
                masks, rendered, _ = render_full(r0, states.history)
                masks = np.asarray(masks)
                for m in range(5):
                    save_png(
                        ep_dir / "birdview_masks" /
                        f"{i_step:04d}_{m:02d}.png",
                        np.transpose(masks[m * 3:m * 3 + 3], (1, 2, 0)),
                    )
                save_png(
                    ep_dir / "birdview" / f"{i_step:04d}.png",
                    np.asarray(rendered),
                )
                if with_cameras:
                    traffic0 = jax.tree.map(
                        lambda a: a[0], states.traffic
                    )
                    for name, off in cams.items():
                        save_png(
                            ep_dir / name / f"{i_step:04d}.png",
                            np.asarray(render_cam(r0, off, traffic0, t)),
                        )
                actions_ep.append(np.asarray(action).tolist())
                metrics_ep.append(np.asarray(metrics[0]).tolist())

                states, out = step_one(states, action)
                metrics, render = out.metrics, out.render
                if bool(out.done[0]):
                    completed = bool(out.info["route_completed"][0])
                    break

            # pandas-style to_json(orient=columns) layout (carla_exp.py:75-80)
            n = len(actions_ep)
            payload = {
                "actions": {str(i): actions_ep[i] for i in range(n)},
                "metrics": {str(i): metrics_ep[i] for i in range(n)},
            }
            (ep_dir / "episode.json").write_text(json.dumps(payload))
            print(
                f"route {route_id:02d} ep {ep_id:02d}: {n} steps "
                f"completed={completed}", file=sys.stderr,
            )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="gail_experts")
    p.add_argument("--routes", type=int, default=10)
    p.add_argument("--eps", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=6000)
    p.add_argument("--no-cameras", action="store_true")
    p.add_argument("--town", default=None,
                   help="generate on a reconstructed town (e.g. Town01) "
                        "instead of the procedural grid benchmark")
    p.add_argument("--compliant", action="store_true",
                   help="expert obeys signals (obey_signals=True), like "
                        "train.py --compliant-demos")
    p.add_argument("--weather", default="ClearNoon",
                   help="weather preset or 'dynamic[_speed]' for camera "
                        "sun/fog lighting (sim/weather.py presets)")
    args = p.parse_args(argv)
    gen_trajectories(
        out_dir=args.out, n_routes=args.routes, n_eps=args.eps,
        max_steps=args.max_steps, with_cameras=not args.no_cameras,
        scene_kwargs=dict(town=args.town) if args.town else None,
        compliant=args.compliant, weather=args.weather,
    )


if __name__ == "__main__":
    main()
