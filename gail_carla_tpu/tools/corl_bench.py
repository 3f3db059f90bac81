"""CoRL2017 benchmark runner: success-rate table over the four original
task types (straight / one_curve / navigation / navigation_dynamic).

The reference builds these tasks in ``corl2017_env.py:7-72`` (per-shape
25-pair route packs under ``scenario_descriptions/CoRL2017``, traffic only
for navigation_dynamic: Town01 20 veh/50 walkers, Town02 15/50). The
original CoRL2017 metric is: an episode SUCCEEDS iff the agent reaches the
goal within the time budget; infractions are tallied separately. Our
episodes run under leaderboard termination, where a collision ends the
episode (terminal/leaderboard.py:1-42 semantics), so the success number
here is the STRICTER reach-goal-without-terminal-collision variant — for
the traffic-free task types the two protocols coincide.

Reuses ``nocrash_bench.run_tier`` (same latched success scan); only the
suite builder and the task-type axis differ.

Usage:
  python -m gail_carla_tpu.tools.corl_bench --ckpt <dir> --town Town01 \
      [--task navigation] [--episodes 2]
"""
from __future__ import annotations

import argparse
import json
import sys

TASK_TYPES = ["straight", "one_curve", "navigation", "navigation_dynamic"]

# generous step budgets (10 Hz): the short shaped legs fit easily in
# 2400 (240 s); cross-town navigation pairs need the demo-generation cap
MAX_STEPS = {"straight": 2400, "one_curve": 2400,
             "navigation": 6000, "navigation_dynamic": 6000}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--expert", action="store_true",
                   help="score the compliant scripted expert instead "
                        "(the imitation ceiling per task type)")
    p.add_argument("--town", default="Town01",
                   choices=["Town01", "Town02"])
    p.add_argument("--obs-mode", default="bev6", choices=["bev", "bev6"])
    p.add_argument("--task", default=None,
                   help="single task type; default all four")
    p.add_argument("--weather", default=None,
                   help="single group (train/new); default both")
    p.add_argument("--episodes", type=int, default=2,
                   help="episodes per route per weather group")
    args = p.parse_args(argv)
    if not args.ckpt and not args.expert:
        p.error("one of --ckpt or --expert is required")

    import dataclasses

    import jax

    from gail_carla_tpu.config import ModelConfig
    from gail_carla_tpu.envs.suites import corl2017_suite
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.tools.nocrash_bench import run_tier
    from gail_carla_tpu.utils import checkpoint as ckpt_mod

    tasks = [args.task] if args.task else TASK_TYPES
    weathers = [args.weather] if args.weather else ["train", "new"]

    net = params = None
    table = {}
    for task in tasks:
        scene, cfg, _ = corl2017_suite(
            task_type=task, town=args.town, weather_group="train",
        )
        cfg = dataclasses.replace(cfg, train=False, obs_mode=args.obs_mode)
        if args.expert:
            cfg = dataclasses.replace(cfg, obs_mode="state")
        elif net is None:
            c = 6 if args.obs_mode == "bev6" else 3
            net, params = init_policy(
                jax.random.PRNGKey(0), ModelConfig(),
                (c, cfg.bev_width, cfg.bev_width),
            )
            latest = ckpt_mod.latest_checkpoint(args.ckpt) or args.ckpt
            restored, _ = ckpt_mod.restore_checkpoint(
                latest, {"params": params}
            )
            params = restored["params"]
        for wg in weathers:
            rng = jax.random.PRNGKey(2017 if wg == "train" else 6017)
            res = run_tier(
                scene, cfg, net, params, rng, args.episodes,
                MAX_STEPS[task], expert=args.expert,
            )
            table[f"{task}/{wg}"] = res
            print(f"{args.town} {task:20s} {wg:6s} "
                  f"success {res['success_rate']:5.1f}% "
                  f"ds {res['mean_driving_score']}", file=sys.stderr)
    print(json.dumps({"town": args.town, "obs_mode": args.obs_mode,
                      "expert": args.expert, "table": table}))


if __name__ == "__main__":
    main()
