"""BC training entry — port of ``learn_bc.py:75-106``'s main block: build
expert train/eval datasets, train the actor-critic with behaviour cloning,
keep the best checkpoint.

By default demos are generated on device; pass --experts-dir to read a
reference-format gail_experts tree instead.

Usage: python -m gail_carla_tpu.tools.learn_bc [--epochs 300]
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--experts-dir", default=None)
    p.add_argument("--out", default="runs/bc")
    p.add_argument("--smoke", action="store_true",
                   help="tiny scene + few epochs")
    p.add_argument("--town", default=None,
                   help="train on a reconstructed town (e.g. Town01) "
                        "instead of the procedural benchmark scene")
    p.add_argument("--obs-mode", default=None, choices=["bev", "bev6"])
    p.add_argument("--compliant-demos", action="store_true",
                   help="expert obeys signals when generating demos")
    p.add_argument("--seed", type=int, default=0,
                   help="net-init seed (a GAIL stage warm-started from "
                        "BC params escapes the sit-still local optimum "
                        "regardless of init seed)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gail_carla_tpu.algo.bc import learn_bc
    from gail_carla_tpu.algo.buffers import build_expert_buffer
    from gail_carla_tpu.algo.expert import generate_demos
    from gail_carla_tpu.config import EnvConfig, ModelConfig
    from gail_carla_tpu.models.policy import init_policy
    from gail_carla_tpu.scene.scene import make_benchmark_scene
    from gail_carla_tpu.utils import checkpoint as ckpt_mod

    if args.smoke:
        scene = make_benchmark_scene(n_routes=2, nx=3, ny=3, block=80.0,
                                     min_length=150.0)
        env_cfg = EnvConfig(train=False, bev_width=64)
        model_cfg = ModelConfig(conv_channels=(8, 16), hidden_size=64,
                                head_size=32, dtype="float32")
        epochs = min(args.epochs, 5)
        routes_train, route_eval, demo_steps = (0,), 1, 900
    elif args.town:
        from gail_carla_tpu.scene.town_import import make_town_scene

        scene = make_town_scene(args.town)
        env_cfg = EnvConfig(train=False)
        model_cfg = ModelConfig()
        epochs = args.epochs
        routes_train = (0, 1, 2, 4, 5, 6, 7, 8, 9)
        route_eval, demo_steps = 3, 4000
    else:
        scene = make_benchmark_scene()
        env_cfg = EnvConfig(train=False)
        model_cfg = ModelConfig()
        epochs = args.epochs
        routes_train = (0, 1, 2, 4, 5, 6, 7, 8, 9)
        route_eval, demo_steps = 3, 4000
    if args.obs_mode:
        import dataclasses

        env_cfg = dataclasses.replace(env_cfg, obs_mode=args.obs_mode)

    if args.experts_dir:
        from gail_carla_tpu.tools.expert_dataset import (
            expert_buffer_from_tree,
        )

        train_buf = expert_buffer_from_tree(args.experts_dir, routes_train)
        eval_buf = expert_buffer_from_tree(args.experts_dir, [route_eval])
    else:
        demos = generate_demos(
            scene, env_cfg, jax.random.PRNGKey(1337),
            jnp.asarray(routes_train, jnp.int32), demo_steps,
            obey_signals=args.compliant_demos,
        )
        demos_eval = generate_demos(
            scene, env_cfg, jax.random.PRNGKey(7331),
            jnp.asarray([route_eval], jnp.int32), demo_steps,
            obey_signals=args.compliant_demos,
        )
        train_buf = build_expert_buffer(scene, env_cfg, demos)
        eval_buf = build_expert_buffer(scene, env_cfg, demos_eval)

    n_ch = 6 if env_cfg.obs_mode == "bev6" else 3
    net, params = init_policy(
        jax.random.PRNGKey(args.seed), model_cfg,
        (n_ch, env_cfg.bev_width, env_cfg.bev_width),
    )
    best_params, best_loss = learn_bc(
        scene, env_cfg, net, params, train_buf, eval_buf,
        jax.random.PRNGKey(1), epochs=epochs,
        log_fn=lambda e, tr, ev: print(
            f"epoch {e}: train {tr:.4f} eval {ev:.4f}", file=sys.stderr
        ),
    )
    ckpt_mod.save_checkpoint(f"{args.out}/best", {"params": best_params})
    print(f"best eval loss {best_loss:.4f} -> {args.out}/best")


if __name__ == "__main__":
    main()
