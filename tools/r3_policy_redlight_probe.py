"""Diagnose the TRAINED policy's red-light rate on Town03 (~3.5/km, flat
through both training stages while Town01 trained to <0.3/km).

Replays a checkpointed policy deterministically over every Town03 route on
CPU, records the per-step ego track + scored red-light events, then
classifies each event by avoidability:

- ``red_visible_s``: how long the scored stop line was BOTH red and inside
  the BEV's forward window (~30 m, pixels_ev_to_bottom geometry) before the
  crossing. Large -> the policy could see it and didn't stop (training
  problem). ~0 -> the light flipped red under the ego (phase-timing /
  dilemma-zone problem the reactive policy cannot solve).
- ``d_yellow_on`` / ``d_red_on``: ego distance to the stop line when the
  phase last flipped to yellow / red. d_red_on < ~8 m at 6 m/s is
  physically doomed for a reactive controller (2 s yellow, signals.py:19).

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/r3_policy_redlight_probe.py [ckpt_dir] [Town03]
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.algo.rollout import _obs_batch
from gail_carla_tpu.config import EnvConfig, ModelConfig
from gail_carla_tpu.models import policy as policy_mod
from gail_carla_tpu.models.policy import init_policy
from gail_carla_tpu.sim import signals
from gail_carla_tpu.sim.env import reset_batch, step_batch
from gail_carla_tpu.train import make_scene
from gail_carla_tpu.utils import checkpoint as ckpt_mod

ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else (
    "runs/r3t3_s0_stage2/ckpt/best_params"
)
town = sys.argv[2] if len(sys.argv) > 2 else "Town03"
N_STEPS = 6000
FWD_VIS_M = 28.0   # red line "visible": within this many metres ahead

scene = make_scene({"town": town})
cfg = EnvConfig(train=False, obs_mode="bev6", max_time=N_STEPS * 0.1)

net, params = init_policy(
    jax.random.PRNGKey(0), ModelConfig(), (6, cfg.bev_width, cfg.bev_width)
)
latest = ckpt_mod.latest_checkpoint(ckpt_dir) or ckpt_dir
restored, _ = ckpt_mod.restore_checkpoint(latest, {"params": params})
params = restored["params"]

R = scene.n_routes
route_ids = jnp.arange(R, dtype=jnp.int32)


@jax.jit
def run(rng):
    states, metrics, render = reset_batch(scene, cfg, rng, route_ids)

    def body(carry, _):
        st, metrics, render, latched = carry
        obs = _obs_batch(scene, cfg, render, metrics)
        _, action, _ = policy_mod.act(
            net, params, obs, metrics, jax.random.PRNGKey(0),
            deterministic=True,
        )
        st2, out = step_batch(scene, cfg, st, action)
        rec = dict(
            xy=st.ego.xy, yaw=st.ego.yaw, speed=st.ego.speed,
            last_red=st2.last_red_light, live=~latched,
        )
        latched = latched | out.done
        return (st2, out.metrics, out.render, latched), rec

    latched0 = jnp.zeros((R,), bool)
    (_, _, _, _), recs = jax.lax.scan(
        body, (states, metrics, render, latched0), None, length=N_STEPS
    )
    return recs


recs = jax.device_get(run(jax.random.PRNGKey(1)))
xy = recs["xy"]            # (T, R, 2)
speed = recs["speed"]      # (T, R)
last_red = recs["last_red"]
live = recs["live"]

tl_stop = np.asarray(scene.tl_stop)        # (T_l, 2, 2)
center = 0.5 * (tl_stop[:, 0] + tl_stop[:, 1])
tl_junction = np.asarray(scene.tl_junction)
tl_group = np.asarray(scene.tl_group)

GREEN_S, YELLOW_S, CYCLE = (
    signals.GREEN_S, signals.YELLOW_S, signals.CYCLE_S
)


def phase_state(light: int, t_s: float) -> int:
    off = (float(tl_junction[light]) * 7.0) % CYCLE
    ph = (t_s + off) % CYCLE
    if tl_group[light] == 0:
        if ph < GREEN_S:
            return signals.GREEN
        return signals.YELLOW if ph < GREEN_S + YELLOW_S else signals.RED
    if ph < GREEN_S + YELLOW_S:
        return signals.RED
    return (
        signals.GREEN if ph < 2 * GREEN_S + YELLOW_S else signals.YELLOW
    )


events = []
for r in range(R):
    prev = -1
    for t in range(N_STEPS):
        if not live[t, r]:
            break
        cur = int(last_red[t, r])
        if cur != prev and cur >= 0:
            # scored red on light `cur` at step t
            d = np.linalg.norm(xy[: t + 1, r] - center[cur], axis=-1)
            # approach window: steps within 45 m before crossing
            w0 = t
            while w0 > 0 and d[w0 - 1] < 45.0:
                w0 -= 1
            ev = dict(route=r, step=t, light=cur,
                      junction=int(tl_junction[cur]),
                      speed_at_cross=float(speed[t, r]))
            red_vis = 0
            d_yellow_on = d_red_on = None
            prev_ph = None
            for u in range(w0, t + 1):
                ph = phase_state(cur, u * 0.1)
                if ph == signals.RED and d[u] < FWD_VIS_M:
                    red_vis += 1
                if prev_ph is not None and ph != prev_ph:
                    if ph == signals.YELLOW:
                        d_yellow_on = float(d[u])
                    if ph == signals.RED:
                        d_red_on = float(d[u])
                prev_ph = ph
            ev["red_visible_s"] = round(red_vis * 0.1, 1)
            ev["d_at_window"] = round(float(d[w0]), 1)
            ev["d_yellow_on"] = (
                None if d_yellow_on is None else round(d_yellow_on, 1)
            )
            ev["d_red_on"] = None if d_red_on is None else round(d_red_on, 1)
            ev["mean_speed_window"] = round(float(speed[w0:t + 1, r].mean()), 2)
            events.append(ev)
        prev = cur

print(json.dumps({"town": town, "ckpt": ckpt_dir, "n_events": len(events),
                  "events": events}, indent=1))

# summary classification
avoid = [e for e in events if e["red_visible_s"] >= 2.0]
doomed = [e for e in events if e["red_visible_s"] < 0.5]
mid = len(events) - len(avoid) - len(doomed)
print(f"\n# {len(events)} events: "
      f"{len(avoid)} visible-red >=2s (policy ignored it), "
      f"{mid} marginal, {len(doomed)} flipped-under-ego (<0.5s visible)",
      file=sys.stderr)
