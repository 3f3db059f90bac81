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
    ap, action = act_j(ap, states)
    states, out = step_j(states, action)
    info = {k: np.asarray(v) for k, v in out.info.items()}
    ego_xy = np.asarray(states.ego.xy)
    for k in prev:
        if k not in info:
            continue
        fired = (info[k] > prev[k]) & ~done_latch
        for i in np.nonzero(fired)[0]:
            events[routes[i]].append({
                "step": t, "kind": k,
                "xy": [float(ego_xy[i, 0]), float(ego_xy[i, 1])],
            })
        prev[k] = np.maximum(prev[k], info[k])
    done_latch |= np.asarray(out.done)
    if done_latch.all():
        break

for r in routes:
    for e in events[r]:
        p = np.array([e["xy"]])
        e["sd_road"] = round(
            float(mask_geo.boundary_signed_distance(geo.bnd_ab, p)[0]), 2)
        e["sd_hard"] = round(
            float(mask_geo.boundary_signed_distance(geo.hard_ab, p)[0]), 2)
print(json.dumps({"routes": {str(r): events[r] for r in routes}},
                 indent=1))
