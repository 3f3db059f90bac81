"""Leaderboard-style policy benchmark: deterministic evaluation over every
route with the reference's scoring (score_route x penalty, per-km infraction
rates — ``ego_vehicle_handler.py:208-248``). The reference's closest
equivalent is running tools/evaluation.py per route and reading the CSVs.

Usage: python -m gail_carla_tpu.tools.benchmark_policy [--ckpt DIR]
"""
from __future__ import annotations

import argparse
import json
import sys


def benchmark(ckpt_dir=None, episodes_per_route: int = 1,
              scene_kwargs=None, max_steps: int = 2400,
              obs_mode: str = "bev", expert: bool = False,
              obey_signals: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gail_carla_tpu.algo.rollout import _obs_batch
    from gail_carla_tpu.config import EnvConfig, ModelConfig
    from gail_carla_tpu.models import policy as policy_mod
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.sim.env import reset_batch, step_batch
    from gail_carla_tpu.train import make_scene

    scene = make_scene(scene_kwargs or {})
    # max_time must track the scan length or the env's own 240 s timeout
    # terminates episodes regardless of max_steps
    cfg = EnvConfig(train=False, obs_mode=obs_mode,
                    max_time=max_steps * 0.1)
    c = 6 if obs_mode == "bev6" else 3
    net, params = init_policy(
        jax.random.PRNGKey(0), ModelConfig(),
        (c, cfg.bev_width, cfg.bev_width),
    )
    if ckpt_dir:
        from gail_carla_tpu.utils import checkpoint as ckpt_mod

        latest = ckpt_mod.latest_checkpoint(ckpt_dir) or ckpt_dir
        restored, _ = ckpt_mod.restore_checkpoint(
            latest, {"params": params}
        )
        params = restored["params"]

    R = scene.n_routes
    route_ids = jnp.arange(R, dtype=jnp.int32)

    if expert:
        # score the scripted expert itself (the imitation ceiling) —
        # noise-free compliant autopilot, same scoring as policies
        import jax as _jax
        from gail_carla_tpu.agents.autopilot import (
            autopilot_act, make_autopilot, reset_autopilot_where,
        )

        ap0 = _jax.tree.map(
            lambda a: jnp.broadcast_to(a, (R,) + a.shape), make_autopilot()
        )

    @jax.jit
    def run(rng):
        states, metrics, render = reset_batch(scene, cfg, rng, route_ids)

        def body(carry, _):
            st, ap, metrics, render, latched = carry
            if expert:
                ap, action = jax.vmap(
                    lambda a, w: autopilot_act(scene, a, w, 6.0,
                                               obey_signals)
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
                "score_route": latch("score_route"),
                "score_penalty": latch("score_penalty"),
                "score_composed": latch("score_composed"),
                "episode_reward": latch("episode_reward"),
                "episode_length": latch("episode_length"),
                "route_completed": latch("route_completed"),
                "collision": latch("collision"),
            }
            return (st2, ap, out.metrics, out.render, latched), None

        latched0 = {
            "done": jnp.zeros((R,), bool),
            "score_route": jnp.zeros((R,)),
            "score_penalty": jnp.zeros((R,)),
            "score_composed": jnp.zeros((R,)),
            "episode_reward": jnp.zeros((R,)),
            "episode_length": jnp.zeros((R,), jnp.int32),
            "route_completed": jnp.zeros((R,), bool),
            "collision": jnp.zeros((R,), bool),
        }
        ap_c = ap0 if expert else jnp.zeros((R,))
        (_, _, _, _, latched), _ = jax.lax.scan(
            body, (states, ap_c, metrics, render, latched0), None,
            length=max_steps,
        )
        return latched

    # episodes_per_route: driving-score evals are noisy (traffic spawns and
    # GNSS noise come from the reset rng); average over seeds for a stable
    # headline number
    outs = [
        {k: np.asarray(v) for k, v in run(jax.random.PRNGKey(1 + e)).items()}
        for e in range(episodes_per_route)
    ]
    rows = []
    for r in range(R):
        ds = [float(o["score_composed"][r]) for o in outs]
        rows.append({
            "route": r,
            "driving_score": round(float(np.mean(ds)), 1),
            "driving_score_std": round(float(np.std(ds)), 1),
            "route_score": round(
                float(np.mean([o["score_route"][r] for o in outs])), 1),
            "penalty": round(
                float(np.mean([o["score_penalty"][r] for o in outs])), 1),
            "reward": round(
                float(np.mean([o["episode_reward"][r] for o in outs])), 3),
            "steps": int(np.mean([o["episode_length"][r] for o in outs])),
            "completed_rate": round(
                float(np.mean([o["route_completed"][r] for o in outs])), 2),
            "collision_rate": round(
                float(np.mean([o["collision"][r] for o in outs])), 2),
        })
        print(rows[-1], file=sys.stderr)
    mean_ds = float(np.mean([r["driving_score"] for r in rows]))
    print(json.dumps({"mean_driving_score": round(mean_ds, 2),
                      "episodes_per_route": episodes_per_route,
                      "routes": rows}))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--town", default=None,
                   help="benchmark on a reconstructed reference town "
                        "(e.g. Town01) instead of the procedural grid")
    p.add_argument("--route-file", default=None,
                   help="route pack for --town (routes_training.xml "
                        "default; Town02/05 only exist in "
                        "routes_testing.xml)")
    p.add_argument("--obs-mode", default="bev",
                   choices=["bev", "bev6", "state"])
    p.add_argument("--episodes", type=int, default=1,
                   help="episodes per route (different env seeds), "
                        "averaged")
    p.add_argument("--expert", action="store_true",
                   help="score the scripted expert autopilot instead of "
                        "a policy (the imitation ceiling)")
    p.add_argument("--no-obey-signals", action="store_true",
                   help="with --expert: ignore red lights (the "
                        "reference's BasicAgent default)")
    p.add_argument("--max-steps", type=int, default=2400,
                   help="episode step cap; Town03+ benchmark routes run "
                        "1.5-2 km, past what 2400 steps covers at the "
                        "6 m/s expert cruise (carla_exp.py:25 uses 6000 "
                        "for demo episodes)")
    args = p.parse_args(argv)
    scene_kwargs = {"town": args.town} if args.town else None
    if scene_kwargs and args.route_file:
        scene_kwargs["route_file"] = args.route_file
    benchmark(args.ckpt, episodes_per_route=args.episodes,
              scene_kwargs=scene_kwargs, obs_mode=args.obs_mode,
              expert=args.expert, max_steps=args.max_steps,
              obey_signals=not args.no_obey_signals)


if __name__ == "__main__":
    main()
