"""Diagnose the Town03 routes where even the COMPLIANT expert collides
(docs/results/r3_town03_expert_6000.json: routes 3/8/9/16/17 end with a
collision on spans the route-repair pipeline could not recover —
RESULTS.md "Round 3: Town03 expert ceiling").

Replays the clean expert on the offending routes and, at each collision,
reports WHAT was hit (layout vs vehicle vs walker counters), WHERE
(position + arc-length along the dense route), and the signed distance to
the H5 road boundary at the ego position over the approach — separating
"route polyline leaves the road" (scene-geometry gap) from actual contact
with a static obstacle.

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/r3_collision_probe.py [Town03] [route_ids...]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.agents.autopilot import (
    autopilot_act, make_autopilot, reset_autopilot_where,
)
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene import mask_geo
from gail_carla_tpu.scene.h5_maps import load_town_geometry
from gail_carla_tpu.scene.town_import import make_town_scene
from gail_carla_tpu.sim.env import reset_batch, step_batch

town = sys.argv[1] if len(sys.argv) > 1 else "Town03"
route_ids = [int(a) for a in sys.argv[2:]] or [3, 8, 9, 16, 17]
N_STEPS = 6000
SEED = int(__import__("os").environ.get("PROBE_SEED", "1"))

scene = make_town_scene(town)
geo = load_town_geometry(town)
cfg = EnvConfig(train=False, max_time=600.0, terminal_mode="leaderboard")

n = int(scene.n_routes)
states, metrics, render = reset_batch(
    scene, cfg, jax.random.PRNGKey(SEED), jnp.arange(n, dtype=jnp.int32)
)
ap0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape),
                   make_autopilot())


def body(carry, _):
    st, ap, met = carry
    ap, actions = jax.vmap(
        lambda a, w: autopilot_act(scene, a, w, 6.0, True)
    )(ap, st)
    new_st, out = step_batch(scene, cfg, st, actions)
    ap = jax.vmap(reset_autopilot_where)(out.done, ap)
    emit = dict(
        collision=out.info["collision"],
        n_layout=out.info["n_collisions_layout"],
        n_vehicle=out.info["n_collisions_vehicle"],
        n_walker=out.info["n_collisions_walker"],
        xy=st.ego.xy, yaw=st.ego.yaw, speed=st.ego.speed, head=st.head,
        done=out.done, completed=out.info["route_completed"],
        score=out.info["score_composed"],
    )
    return (new_st, ap, out.metrics), emit


_, tr = jax.lax.scan(body, (states, ap0, metrics), None, length=N_STEPS)
tr = jax.tree.map(np.asarray, tr)

route_xy = np.asarray(scene.route_xy)
route_n = np.asarray(scene.route_n)

for rid in route_ids:
    k = rid
    cols = np.nonzero(tr["collision"][:, k])[0]
    dn = np.nonzero(tr["done"][:, k])[0]
    end = dn[0] if len(dn) else N_STEPS - 1
    print(f"\n=== route {rid}: {len(cols)} collision step(s), done@{end} "
          f"completed={bool(tr['completed'][end, k])} "
          f"score={tr['score'][end, k]:.1f} "
          f"counters layout={int(tr['n_layout'][end, k])} "
          f"veh={int(tr['n_vehicle'][end, k])} "
          f"walk={int(tr['n_walker'][end, k])} ===")
    for f in cols[:3]:
        ego = tr["xy"][f, k]
        hd = int(tr["head"][f, k])
        sd_here = float(mask_geo.boundary_signed_distance(
            geo.bnd_ab, ego[None, :])[0])
        print(f"  hit @ step {f} pos {ego.round(1)} head={hd} "
              f"speed={tr['speed'][f, k]:.1f} "
              f"signed_dist_to_road_boundary={sd_here:.2f} m "
              f"(<0 = off-road)")
        for back in (60, 40, 25, 15, 8, 4, 0):
            j = max(f - back, 0)
            p = tr["xy"][j, k]
            sd = float(mask_geo.boundary_signed_distance(
                geo.bnd_ab, p[None, :])[0])
            print(f"    t-{back:3d}: pos {p.round(1)} sd={sd:6.2f} "
                  f"v={tr['speed'][j, k]:4.1f}")
        # where the ROUTE POLYLINE itself sits around the hit
        nr = int(route_n[k])
        lo, hi = max(hd - 10, 0), min(hd + 30, nr)
        seg = route_xy[k, lo:hi]
        sd_seg = np.asarray(
            mask_geo.boundary_signed_distance(geo.bnd_ab, seg))
        print(f"    route polyline [{lo}:{hi}] min signed dist "
              f"{sd_seg.min():.2f} m at idx {lo + int(sd_seg.argmin())}")
