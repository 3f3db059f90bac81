"""Microbench the bev/bev6 Pallas kernels (VERDICT r3 next-step #5: the
with-BEV bench regressed 43.4k -> 32.0k when the road channel moved to
oriented-boundary edge tests).

Reports per-call wall time (best-of-N) and the live segment-table counts
the kernels actually iterate, on the bench's grid scene and on Town01 —
the data that decides whether the cost is edge COUNT (table size) or
per-edge op count.

Usage: python tools/r4_bev_kernel_bench.py [n_envs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gail_carla_tpu.config import EnvConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene
from gail_carla_tpu.sim.env import reset_batch

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def bench_scene(tag, scene):
    cfg = EnvConfig(train=True)
    rng = jax.random.PRNGKey(0)
    rids = jnp.arange(N, dtype=jnp.int32) % scene.n_routes
    states, metrics, render = reset_batch(scene, cfg, rng, rids)

    # count table sizes via the scene arrays
    import numpy as _np
    print(f"[{tag}]", flush=True)
    for name in ("cell_bnd_n", "cell_hard_n", "cell_road_n", "cell_lane_n", "cell_tl_n"):
        if hasattr(scene, name) and getattr(scene, name) is not None:
            a = _np.asarray(getattr(scene, name))
            print(f"  {name}: shape={a.shape} mean={a.mean():.0f} "
                  f"max={a.max()}", flush=True)

    def run(fn, label):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"  {label}: {best*1e3:.1f} ms  ({N/best:,.0f} renders/s)",
              flush=True)
        return best

    from gail_carla_tpu.algo.rollout import _render_batch
    f = jax.jit(lambda r: _render_batch(scene, cfg, r))
    run(lambda: f(render), "bev3 render")
    cfg6 = EnvConfig(train=True, obs_mode="bev6")
    from gail_carla_tpu.ops.bev6 import render_bev6_batch_auto
    _, _, r6 = reset_batch(scene, cfg6, rng, rids)
    f6 = jax.jit(lambda r: render_bev6_batch_auto(scene, cfg6, r))
    run(lambda: f6(r6), "bev6 render")


bench_scene("grid 4x4", make_benchmark_scene(
    n_routes=10, nx=4, ny=4, block=100.0, min_length=400.0))

from gail_carla_tpu.scene.town_import import make_town_scene
try:
    bench_scene("Town01", make_town_scene("Town01"))
except Exception as e:
    print("Town01 skipped:", e)
