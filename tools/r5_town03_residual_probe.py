"""Re-diagnose the round-5 Town03 expert-ceiling residuals
(docs/results/r4_town03_expert.json: route 2 penalty 70 = one red light,
routes 9/17 penalty 65 = one static collision each).

Runs the compliant expert on the named routes on CPU, stepping the real
env, and records where each infraction latches: ego pose, step, signed
distance to the road/hard boundaries at the event, and — for the red
light — which stop line scored it. Output feeds the RESULTS.md round-5
residual table.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python tools/r5_town03_residual_probe.py [route ...]
"""
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.agents.autopilot import autopilot_act, make_autopilot
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene import mask_geo
from gail_carla_tpu.scene.h5_maps import load_town_geometry
from gail_carla_tpu.scene.town_import import make_town_scene
from gail_carla_tpu.sim.env import reset_batch, step_batch

routes = [int(a) for a in sys.argv[1:]] or [2, 9, 17]
scene = make_town_scene("Town03")
geo = load_town_geometry("Town03")
cfg = EnvConfig(train=False, obs_mode="state", max_time=600.0)

B = len(routes)
rng = jax.random.PRNGKey(0)
states, metrics, render = reset_batch(
    scene, cfg, rng, jnp.asarray(routes, jnp.int32)
)
ap = jax.tree.map(
    lambda a: jnp.broadcast_to(a, (B,) + a.shape), make_autopilot()
)

step_j = jax.jit(lambda st, a: step_batch(scene, cfg, st, a))
act_j = jax.jit(
    lambda ap, st: jax.vmap(
        lambda a, w: autopilot_act(scene, a, w, 6.0, True)
    )(ap, st)
)

prev = {k: np.zeros(B) for k in
        ("n_collisions_layout", "n_collisions_vehicle", "n_red_light")}
events = {r: [] for r in routes}
done_latch = np.zeros(B, bool)
for t in range(6000):
    # pose going INTO this step: the step that fires an infraction ends
    # with an auto-reset, so post-step ego.xy is the respawn pose
    pre_xy = np.asarray(states.ego.xy)
    pre_yaw = np.asarray(states.ego.yaw)
    ap, action = act_j(ap, states)
    states, out = step_j(states, action)
    info = {k: np.asarray(v) for k, v in out.info.items()}
    col_xy = np.asarray(getattr(states, "col_xy", np.full((B, 2), 1e9)))
    for k in prev:
        if k not in info:
            continue
        fired = (info[k] > prev[k]) & ~done_latch
        for i in np.nonzero(fired)[0]:
            ev = {
                "step": t, "kind": k,
                "xy": [float(pre_xy[i, 0]), float(pre_xy[i, 1])],
                "yaw_deg": round(float(np.degrees(pre_yaw[i])), 1),
            }
            if abs(col_xy[i, 0]) < 1e8:
                ev["col_xy"] = [float(col_xy[i, 0]),
                                float(col_xy[i, 1])]
            events[routes[i]].append(ev)
        prev[k] = np.maximum(prev[k], info[k])
    done_latch |= np.asarray(out.done)
    if done_latch.all():
        break

HL, HW = 2.7, 1.3           # inflated half extents, as the route gates
for r in routes:
    for e in events[r]:
        p = np.array([e["xy"]])
        e["sd_road"] = round(
            float(mask_geo.boundary_signed_distance(geo.bnd_ab, p)[0]), 2)
        e["sd_hard"] = round(
            float(mask_geo.boundary_signed_distance(geo.hard_ab, p)[0]), 2)
        yaw = np.radians(e["yaw_deg"])
        f = np.array([np.cos(yaw), np.sin(yaw)])
        lt = np.array([-np.sin(yaw), np.cos(yaw)])
        corners = np.stack([p[0] + a * HL * f + b * HW * lt
                            for a in (1, -1) for b in (1, -1)])
        sd_c = mask_geo.boundary_signed_distance(geo.hard_ab, corners)
        e["corner_sd_hard"] = [round(float(v), 2) for v in sd_c]
print(json.dumps({"routes": {str(r): events[r] for r in routes}},
                 indent=1))
