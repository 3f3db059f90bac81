"""Checkpoint evaluation — port of ``tools/evaluation.py:7-58``: load a
policy checkpoint and run N deterministic episodes on a chosen route,
reporting reward/length/completion per episode.

Usage: python -m gail_carla_tpu.tools.evaluation --ckpt <dir> [--route 3]
"""
from __future__ import annotations

import argparse
import json
import sys


def evaluate(ckpt_dir=None, route: int = 3, episodes: int = 10,
             scene_kwargs=None):
    import jax
    import jax.numpy as jnp

    from gail_carla_tpu.algo.evaluate import evaluate_policy
    from gail_carla_tpu.config import EnvConfig, ModelConfig
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.scene.scene import make_benchmark_scene

    scene = make_benchmark_scene(**(scene_kwargs or {}))
    env_cfg = EnvConfig(train=False)
    net, params = init_policy(
        jax.random.PRNGKey(0), ModelConfig(),
        (3, env_cfg.bev_width, env_cfg.bev_width),
    )
    if ckpt_dir:
        from gail_carla_tpu.utils import checkpoint as ckpt_mod

        latest = ckpt_mod.latest_checkpoint(ckpt_dir) or ckpt_dir
        state, _ = ckpt_mod.restore_checkpoint(latest, {"params": params})
        params = (
            state["params"] if isinstance(state, dict) else state
        )

    results = []
    for ep in range(episodes):
        out = evaluate_policy(
            scene, env_cfg, net, params, jax.random.PRNGKey(ep), route,
            max_steps=env_cfg.max_steps,
        )
        results.append({
            "episode": ep,
            "reward": float(out["reward"][0]),
            "length": int(out["length"][0]),
            "completed": bool(out["completed"][0]),
        })
        print(results[-1], file=sys.stderr)
    print(json.dumps(results))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--route", type=int, default=3)
    p.add_argument("--episodes", type=int, default=10)
    args = p.parse_args(argv)
    evaluate(args.ckpt, args.route, args.episodes)


if __name__ == "__main__":
    main()
