"""Round-5 shape bench for the UNCAPPED NoCrash traffic tiers (VERDICT r4
next-step #3): the round-4 uncap removed the 32-per-kind NPC budget without
measuring what it guarded. Per-world actor arrays are dense, so the tier
density sets the compiled actor-loop size of every step at every env count.

Measures, per (tier, n_envs): jit compile time of a 64-step rollout scan,
steady-state sim steps/s (best of 3), and device HBM in use after the run.
Run on the real chip (default env):  python tools/r5_dense_shape_bench.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench_tier(town, tier, n_envs, steps=64, obs_mode="state"):
    from gail_carla_tpu.envs.suites import nocrash_suite
    from gail_carla_tpu.sim.env import reset_batch, step_batch

    scene, cfg, _ = nocrash_suite(
        town=town, background_traffic=tier, weather_group="train"
    )
    cfg = dataclasses.replace(cfg, train=False, obs_mode=obs_mode)
    route_ids = jnp.arange(n_envs, dtype=jnp.int32) % scene.n_routes

    @jax.jit
    def run(rng):
        states, metrics, render = reset_batch(scene, cfg, rng, route_ids)

        def body(st, _):
            st2, out = step_batch(
                scene, cfg, st,
                jnp.tile(jnp.array([0.0, 0.6]), (n_envs, 1)),
            )
            return st2, out.reward.sum()

        st, rew = jax.lax.scan(body, states, None, length=steps)
        return rew.sum()

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    run(rng).block_until_ready()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        run(rng).block_until_ready()
        best = min(best, time.time() - t0)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        hbm_gb = ms.get("bytes_in_use", 0) / 2**30
    except Exception:
        hbm_gb = -1.0
    return {
        "town": town, "tier": tier, "n_envs": n_envs,
        "n_npc": list(__import__(
            "gail_carla_tpu.envs.suites", fromlist=["NOCRASH_TRAFFIC"]
        ).NOCRASH_TRAFFIC[town][tier]),
        "compile_s": round(compile_s, 1),
        "steps_per_s": round(n_envs * steps / best, 1),
        "hbm_gb_in_use": round(hbm_gb, 2),
    }


def main():
    rows = []
    for tier in ["regular", "dense", "leaderboard"]:
        for n_envs in [16, 25]:
            r = bench_tier("Town01", tier, n_envs)
            rows.append(r)
            print(json.dumps(r), file=sys.stderr)
    print(json.dumps({"bench": "nocrash_tier_shapes", "rows": rows}))


if __name__ == "__main__":
    main()
