"""NoCrash benchmark runner: success-rate table on the reconstructed real
towns (the community benchmark the reference family reports).

The reference builds these tasks in ``nocrash_env.py:7-81`` (per-town
traffic densities, weather groups, the shipped 25-pair route packs) and
leaves success semantics to its terminal config; the community NoCrash
metric is: an episode SUCCEEDS iff the agent reaches the goal within the
time budget with no collision. Here: ``route_completed & ~collision``
latched at first episode end under leaderboard termination (which keeps
driving through infractions like the benchmark's agents do).

Weather note: policy obs are BEV masks, which are weather-invariant in
CARLA too (chauffeurnet.py renders from map+actor state, not camera), so
the train/new-weather split only varies the episode seeds here; dynamics
are identical. Reported for table-format parity.

Usage:
  python -m gail_carla_tpu.tools.nocrash_bench --ckpt runs/ckpt/best_params \
      --town Town02 --obs-mode bev6 [--traffic regular] [--episodes 2]
"""
from __future__ import annotations

import argparse
import json
import sys


def run_tier(scene, cfg, net, params, rng, episodes: int,
             max_steps: int, expert: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gail_carla_tpu.algo.rollout import _obs_batch
    from gail_carla_tpu.models import policy as policy_mod
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    R = scene.n_routes
    route_ids = jnp.arange(R, dtype=jnp.int32)

    if expert:
        # the NoCrash ceiling: the compliant autopilot hazard-brakes for
        # lead vehicles/walkers (agents/autopilot.py:240-255), so its
        # success rate bounds what traffic-aware imitation can reach
        from gail_carla_tpu.agents.autopilot import (
            autopilot_act, make_autopilot, reset_autopilot_where,
        )

        ap0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (R,) + a.shape), make_autopilot()
        )

    @jax.jit
    def run(rng):
        states, metrics, render = reset_batch(scene, cfg, rng, route_ids)

        def body(carry, _):
            st, ap, metrics, render, latched = carry
            if expert:
                ap, action = jax.vmap(
                    lambda a, w: autopilot_act(scene, a, w, 6.0, True)
                )(ap, st)
            else:
                obs = _obs_batch(scene, cfg, render, metrics)
                _, action, _ = policy_mod.act(
                    net, params, obs, metrics, jax.random.PRNGKey(0),
                    deterministic=True,
                )
            st2, out = step_batch(scene, cfg, st, action)
            if expert:
                ap = jax.vmap(reset_autopilot_where)(out.done, ap)
            first = out.done & (~latched["done"])

            def latch(key):
                return jnp.where(first, out.info[key], latched[key])

            latched = {
                "done": latched["done"] | out.done,
                "route_completed": latch("route_completed"),
                "collision": latch("collision"),
                "score_composed": latch("score_composed"),
            }
            return (st2, ap, out.metrics, out.render, latched), None

        latched0 = {
            "done": jnp.zeros((R,), bool),
            "route_completed": jnp.zeros((R,), bool),
            "collision": jnp.zeros((R,), bool),
            "score_composed": jnp.zeros((R,)),
        }
        ap_c = ap0 if expert else jnp.zeros((R,))
        (_, _, _, _, latched), _ = jax.lax.scan(
            body, (states, ap_c, metrics, render, latched0), None,
            length=max_steps,
        )
        return latched

    succ = []
    ds = []
    for e in range(episodes):
        k = jax.random.fold_in(rng, e)
        out = {k2: np.asarray(v) for k2, v in run(k).items()}
        # NoCrash success: goal reached (timeout counts as failure via
        # ~route_completed) and zero collisions
        succ.append(out["route_completed"] & ~out["collision"])
        ds.append(out["score_composed"])
    succ = np.stack(succ)           # (E, R)
    return {
        "success_rate": round(float(succ.mean()) * 100.0, 1),
        "n_routes": int(succ.shape[1]),
        "episodes": episodes,
        "mean_driving_score": round(float(np.stack(ds).mean()), 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--expert", action="store_true",
                   help="score the compliant scripted expert instead of a "
                        "policy (the traffic-aware imitation ceiling)")
    p.add_argument("--town", default="Town01",
                   choices=["Town01", "Town02"])
    p.add_argument("--obs-mode", default="bev6",
                   choices=["bev", "bev6"])
    p.add_argument("--traffic", default=None,
                   help="single tier (empty/regular/dense); default all")
    p.add_argument("--weather", default=None,
                   help="single group (train/new); default both")
    p.add_argument("--episodes", type=int, default=2,
                   help="episodes per route per weather group")
    p.add_argument("--max-steps", type=int, default=2400)
    args = p.parse_args(argv)
    if not args.ckpt and not args.expert:
        p.error("one of --ckpt or --expert is required")

    import dataclasses

    import jax

    from gail_carla_tpu.config import ModelConfig
    from gail_carla_tpu.envs.suites import nocrash_suite
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.utils import checkpoint as ckpt_mod

    tiers = [args.traffic] if args.traffic else [
        "empty", "regular", "dense", "leaderboard"
    ]
    weathers = [args.weather] if args.weather else ["train", "new"]

    net = params = None
    table = {}
    for tier in tiers:
        scene, cfg, _ = nocrash_suite(
            town=args.town, background_traffic=tier,
            weather_group="train",
        )
        # eval: start episodes at the route start (no resume curriculum)
        cfg = dataclasses.replace(
            cfg, train=False, obs_mode=args.obs_mode
        )
        if args.expert:
            # the expert never renders; skip BEV for a pure-sim scan
            cfg = dataclasses.replace(cfg, obs_mode="state")
        elif net is None:
            c = 6 if args.obs_mode == "bev6" else 3
            net, params = init_policy(
                jax.random.PRNGKey(0), ModelConfig(),
                (c, cfg.bev_width, cfg.bev_width),
            )
            latest = (
                ckpt_mod.latest_checkpoint(args.ckpt) or args.ckpt
            )
            restored, _ = ckpt_mod.restore_checkpoint(
                latest, {"params": params}
            )
            params = restored["params"]
        for wg in weathers:
            # weather only varies seeds for a BEV policy (docstring)
            rng = jax.random.PRNGKey(
                2021 if wg == "train" else 4077
            )
            res = run_tier(
                scene, cfg, net, params, rng, args.episodes,
                args.max_steps, expert=args.expert,
            )
            table[f"{tier}/{wg}"] = res
            print(f"{args.town} {tier:8s} {wg:6s} "
                  f"success {res['success_rate']:5.1f}% "
                  f"ds {res['mean_driving_score']}", file=sys.stderr)
    print(json.dumps({"town": args.town, "obs_mode": args.obs_mode,
                      "expert": args.expert, "table": table}))


if __name__ == "__main__":
    main()
