"""Diagnose the residual red-light penalties of the COMPLIANT expert on
Town03 (RESULTS.md "Round 3: Town03 expert ceiling": routes 1/2/10/14/15
complete but lose one red each — penalty 70).

For each offending route, replay the signal-obeying expert (no noise) and,
at every run_red_light fire, dump the full geometry: which light fired,
its junction, phase timeline around the crossing, the ego's
approach profile (distance to that stop line vs time), and what the
expert's own route-scan detector (agents/autopilot.py:134-177) saw during
the approach. Separates "expert never saw the light" (detection miss)
from "expert predicted green but crossed red" (prediction miss) from
"criterion scored a foreign approach's line" (criterion geometry).

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/r3_redlight_probe.py [Town03] [route_ids...]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.agents.autopilot import (
    autopilot_act, make_autopilot, reset_autopilot_where,
)
from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.town_import import make_town_scene
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.env import reset_batch, step_batch

town = sys.argv[1] if len(sys.argv) > 1 else "Town03"
route_ids = [int(a) for a in sys.argv[2:]] or [1, 2, 10, 14, 15]
N_STEPS = 6000
# benchmark_policy scores episode e with reset key PRNGKey(1 + e)
SEED = int(__import__("os").environ.get("PROBE_SEED", "1"))

scene = make_town_scene(town)
cfg = EnvConfig(train=False, max_time=600.0, terminal_mode="leaderboard")

# reset ALL routes in one batch exactly like benchmark_policy (reset keys
# split per env position, so a 5-env batch would see different randomness)
n = int(scene.n_routes)
rids = jnp.arange(n, dtype=jnp.int32)
states, metrics, render = reset_batch(
    scene, cfg, jax.random.PRNGKey(SEED), rids
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
        ran_red=out.info["run_red_light"],
        last_red=new_st.last_red_light,
        xy=st.ego.xy, yaw=st.ego.yaw, speed=st.ego.speed,
        step=st.step, head=st.head,
        done=out.done, completed=out.info["route_completed"],
    )
    return (new_st, ap, out.metrics), emit


_, tr = jax.lax.scan(body, (states, ap0, metrics), None, length=N_STEPS)
tr = jax.tree.map(np.asarray, tr)

tl_stop = np.asarray(scene.tl_stop)
tl_yaw = np.asarray(scene.tl_yaw)
tl_junction = np.asarray(scene.tl_junction)
center = np.asarray(signals.stopline_center(scene))


def light_state(i, t):
    return int(signals.light_states(scene, jnp.asarray(t))[i])


for rid in route_ids:
    k = rid
    fires = np.nonzero(tr["ran_red"][:, k])[0]
    dn = np.nonzero(tr["done"][:, k])[0]
    end = dn[0] if len(dn) else N_STEPS - 1
    print(f"\n=== route {rid}: {len(fires)} red(s), done@{end} "
          f"completed={bool(tr['completed'][end, k])} ===")
    for f in fires:
        li = int(tr["last_red"][f, k])
        t_f = float(tr["step"][f, k]) * cfg.dt
        a, b = tl_stop[li, 0], tl_stop[li, 1]
        ego = tr["xy"][f, k]
        yaw = float(tr["yaw"][f, k])
        print(f"  fire @ step {f} (t={t_f:.1f}s) light {li} "
              f"junction {int(tl_junction[li])}")
        print(f"    stopline {a.round(1)}->{b.round(1)} "
              f"tl_yaw {np.degrees(tl_yaw[li]):.0f} ego_yaw "
              f"{np.degrees(yaw):.0f} speed {tr['speed'][f, k]:.1f}")
        # approach profile: distance to THIS stop line + light state
        for back in (100, 75, 50, 40, 30, 20, 10, 5, 2, 0):
            j = max(f - back, 0)
            d = np.linalg.norm(center[li] - tr["xy"][j, k])
            t_j = float(tr["step"][j, k]) * cfg.dt
            print(f"    t-{back:3d}: d={d:6.1f} m v={tr['speed'][j, k]:4.1f} "
                  f"state={light_state(li, t_j)} (0=R)")
        # siblings at the same junction and their states at fire time
        sib = np.nonzero(tl_junction == tl_junction[li])[0]
        ss = [f"{s}:{light_state(s, t_f)}" for s in sib]
        print(f"    junction lights (id:state@fire) {' '.join(ss)}")
