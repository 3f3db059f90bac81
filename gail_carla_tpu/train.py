"""WDGAIL training entry point — the ``wdail_carla.py`` equivalent.

Pipeline (wdail_carla.py:129-250 restructured TPU-first):
1. compile the static scene (stand-in for CARLA town + routes_training.xml)
2. generate expert demos ON DEVICE with the scripted autopilot + noiser
   (replaces reading gail_experts/ PNG trees)
3. build the learner (sharded over all visible chips when >1)
4. loop jitted updates; periodic deterministic eval on the held-out route;
   checkpoint the full train state every update

Usage:
    python -m gail_carla_tpu.train --preset smoke
    python -m gail_carla_tpu.train --preset reference
    python -m gail_carla_tpu.train --params params.json   # reference schema
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gail_carla_tpu.algo.buffers import build_expert_buffer
from gail_carla_tpu.algo.evaluate import evaluate_policy
from gail_carla_tpu.algo.expert import generate_demos
from gail_carla_tpu.algo.learner import WDGAILLearner
from gail_carla_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gail_carla_tpu.scene.scene import make_benchmark_scene
from gail_carla_tpu.utils import checkpoint as ckpt_mod
from gail_carla_tpu.utils.logging import MetricsWriter


def make_scene(scene_kwargs):
    """Scene dispatch: ``{"town": "Town01"}`` builds the reconstructed
    reference town (scene/town_import.py); otherwise the procedural grid
    benchmark."""
    if "town" in scene_kwargs:
        from gail_carla_tpu.scene.town_import import make_town_scene

        return make_town_scene(**scene_kwargs)
    return make_benchmark_scene(**scene_kwargs)


def make_presets():
    smoke = dict(
        env=EnvConfig(train=True, bev_width=64),
        model=ModelConfig(conv_channels=(8, 16), hidden_size=64,
                          head_size=32, disc_hidden=32, dtype="float32"),
        train=TrainConfig(
            n_envs=4, num_steps=256, num_env_steps=2048,
            mini_batch_size=32, ppo_epoch=2, gail_batch_size=32,
            gail_pre_epoch=2, gail_epoch=1, gail_thre=2,
            routes=(0, 1), eval_route=1, eval_interval=2,
        ),
        scene=dict(n_routes=2, nx=3, ny=3, block=80.0, min_length=150.0),
        demo_steps=900,
    )
    reference = dict(
        env=EnvConfig(train=True),
        model=ModelConfig(),
        train=TrainConfig(n_envs=10),
        scene=dict(n_routes=10, nx=4, ny=4, block=100.0, min_length=400.0),
        demo_steps=4000,
    )
    # the reference's ACTUAL benchmark: reconstructed Town01, training
    # routes 0-9 (route 3 held out), params_variable.json:10-14
    town01 = dict(
        env=EnvConfig(train=True),
        model=ModelConfig(),
        train=TrainConfig(n_envs=10),
        scene=dict(town="Town01"),
        demo_steps=4000,
    )
    # multi-lane towns (VERDICT r3 item #3): same benchmark shape as
    # town01 — the Town03/Town04 blocks of routes_training.xml, route 3
    # held out. CHANGELANE legs in these packs exercise commands 5/6.
    # Town03/04 leaderboard routes run 0.7-2.3 km (vs Town01's ~0.4 km), so
    # episodes get the demo-generation cap (carla_exp.py:25 env_ep_length
    # 6000; the reference evaluates with NO timeout, terminal/leaderboard.py)
    # and demos the same. Training routes are restricted to the ones the
    # compliant expert COMPLETES on the round-5 repaired scene
    # (docs/results/r4_town03_expert.json, ceiling 89.66: routes 9 and 17
    # end in static collisions on the two residual un-plannable spans;
    # route 3 is a clean timeout-complete long route and trains fine).
    # Route 13 is held out, mirroring the town01 shape.
    town03 = dict(
        env=EnvConfig(train=True, max_time=600.0),
        model=ModelConfig(),
        train=TrainConfig(
            n_envs=16,
            routes=(0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 14, 15, 16,
                    18, 19),
            eval_route=13,
        ),
        scene=dict(town="Town03"),
        demo_steps=6000,
    )
    town04 = dict(
        env=EnvConfig(train=True, max_time=600.0),
        model=ModelConfig(),
        train=TrainConfig(n_envs=10),
        scene=dict(town="Town04"),
        demo_steps=6000,
    )
    return {"smoke": smoke, "reference": reference, "town01": town01,
            "town03": town03, "town04": town04}


def run(env_cfg, model_cfg, tcfg, scene_kwargs, demo_steps,
        max_updates=None, log_dir="runs/wdgail", ckpt_dir=None,
        use_sharding=None, profile=False, demo_obey_signals=False,
        eval_all_routes=False, ckpt_keep=2, init_params=None,
        eval_seeds=1, demo_tree=None, eval_chunk=0):
    scene = make_scene(scene_kwargs)
    writer = MetricsWriter(log_dir)

    if demo_tree:
        # --- expert demos from a gail_experts/ PNG tree on disk (the
        # reference's actual input path, wdail_carla.py + ExpertDataset
        # algo/wdgail.py:192-241); obs are materialised so nothing ever
        # re-renders ---
        from gail_carla_tpu.tools.expert_dataset import (
            expert_buffer_from_tree,
        )

        n_ch = 6 if env_cfg.obs_mode == "bev6" else 3
        expert = expert_buffer_from_tree(
            demo_tree, tcfg.routes, n_channels=n_ch
        )
        expert_val = expert_buffer_from_tree(
            demo_tree, [tcfg.eval_route], n_channels=n_ch
        )
    else:
        # --- expert demos on device (train + held-out val split) ---
        routes = jnp.asarray(tcfg.routes, jnp.int32)
        # expert gen runs with a longer episode cap than training
        # (carla_exp.py:25 uses env_ep_length=6000 vs the training 2400)
        demo_cfg = dataclasses.replace(
            env_cfg, train=False, max_time=max(env_cfg.max_time, 600.0),
            # demos always run under leaderboard termination — a dagger
            # training terminal (ends on red/stop) would cut expert
            # episodes before route completion and leave no valid demos
            terminal_mode="leaderboard",
        )
        demos = generate_demos(
            scene, demo_cfg, jax.random.PRNGKey(1337), routes, demo_steps,
            obey_signals=demo_obey_signals,
        )
        demos_val = generate_demos(
            scene, demo_cfg, jax.random.PRNGKey(7331),
            jnp.asarray([tcfg.eval_route], jnp.int32), demo_steps,
            obey_signals=demo_obey_signals,
        )
        # cap the train buffer near the reference's demo size (~7200
        # steps, params_variable.json:13-14 routes x ~720-step episodes);
        # valid steps beyond the cap would only cost HBM
        expert = build_expert_buffer(scene, env_cfg, demos, max_size=12288)
        expert_val = build_expert_buffer(
            scene, env_cfg, demos_val, size=min(1024, expert.size)
        )
    print(f"expert buffer: {expert.size} transitions "
          f"(+{expert_val.size} val)", file=sys.stderr)

    n_dev = len(jax.devices())
    if use_sharding is None:
        use_sharding = n_dev > 1 and tcfg.n_envs % n_dev == 0
    if use_sharding:
        from gail_carla_tpu.parallel.mesh import ShardedWDGAILLearner

        learner = ShardedWDGAILLearner(
            scene, env_cfg, model_cfg, tcfg, expert, expert_val
        )
    else:
        learner = WDGAILLearner(
            scene, env_cfg, model_cfg, tcfg, expert, expert_val
        )
    state = learner.init_state()
    if init_params:
        # warm start the POLICY only from a params-only checkpoint
        # (ckpt_dir/best_params shape); discriminator, optimizers and env
        # states start fresh
        restored, _ = ckpt_mod.restore_checkpoint(
            init_params, {"params": state.policy_params}
        )
        state = state.replace(policy_params=restored["params"])
        print(f"warm-started policy from {init_params}", file=sys.stderr)

    elapsed0 = 0.0
    if ckpt_dir and tcfg.resume_training:
        latest = ckpt_mod.latest_checkpoint(ckpt_dir)
        if latest:
            state, elapsed0 = ckpt_mod.restore_checkpoint(latest, state)
            print(f"resumed from {latest}", file=sys.stderr)

    n_updates = tcfg.n_updates if max_updates is None else max_updates
    t0 = time.time() - elapsed0
    eval_metrics = {}
    best_score = -1.0
    if ckpt_dir and tcfg.resume_training:
        # a resumed run must not clobber ckpt_dir/best with a worse
        # post-resume eval: restore the recorded best score too
        try:
            with open(f"{ckpt_dir}/best_score.json") as f:
                best_score = float(json.load(f)["score"])
            print(f"resumed best score {best_score:.2f}", file=sys.stderr)
        except (OSError, ValueError, KeyError):
            pass
    while int(state.update_i) < n_updates:
        if profile and int(state.update_i) == 1:
            # SURVEY §5: the reference has no tracing at all; we capture a
            # device profile of one steady-state update.
            with jax.profiler.trace(f"{log_dir}/profile"):
                state, metrics = learner.update(state)
                jax.block_until_ready(metrics)
        else:
            state, metrics = learner.update(state)
        i = int(state.update_i)

        if i % tcfg.eval_interval == 0 or not eval_metrics:
            ev = evaluate_policy(
                scene, env_cfg, learner.policy_net, state.policy_params,
                jax.random.PRNGKey(i), tcfg.eval_route,
                max_steps=env_cfg.max_steps,
            )
            eval_metrics = {
                "eval/reward": float(ev["reward"][0]),
                "eval/length": float(ev["length"][0]),
                "eval/completed": float(ev["completed"][0]),
                "eval/score": float(ev["score_composed"][0]),
            }
            if eval_all_routes:
                # leaderboard-table eval: eval_seeds envs per route in one
                # batched call, deterministic policy, FIXED reset key —
                # in-train scores stay comparable across updates so
                # best-checkpoint selection isn't eval-seed lottery
                # (VERDICT r2 weak #2: 1-ep/route scores are ±10 noisy)
                all_ids = np.tile(np.arange(scene.n_routes), eval_seeds)
                # optionally split the table eval into fixed-size env
                # chunks: big towns x long caps (Town03: 40 envs x 6000
                # steps) have crashed the remote TPU worker in one shot,
                # and equal-size chunks reuse one compiled executable
                chunk = eval_chunk or len(all_ids)
                pad = (-len(all_ids)) % chunk
                all_ids = np.concatenate([all_ids, all_ids[:pad]])
                parts = [
                    evaluate_policy(
                        scene, env_cfg, learner.policy_net,
                        state.policy_params, jax.random.PRNGKey(4242),
                        route_ids=all_ids[j:j + chunk],
                        max_steps=env_cfg.max_steps,
                    )
                    for j in range(0, len(all_ids), chunk)
                ]
                evr = {
                    k: np.concatenate([np.asarray(p[k]) for p in parts])[
                        :len(all_ids) - pad]
                    for k in parts[0]
                }
                eval_metrics.update({
                    "eval/mean_driving_score": float(
                        np.mean(evr["score_composed"])
                    ),
                    "eval/routes_completed": float(
                        np.sum(evr["completed"])
                    ),
                    "eval/red_light_per_km": float(
                        np.mean(evr["red_light_per_km"])
                    ),
                })
                if ckpt_dir and eval_metrics[
                    "eval/mean_driving_score"
                ] > best_score:
                    best_score = eval_metrics["eval/mean_driving_score"]
                    ckpt_mod.save_checkpoint(
                        f"{ckpt_dir}/best", state, time.time() - t0
                    )
                    # params-only copy in the shape benchmark_policy
                    # restores ({"params": ...})
                    ckpt_mod.save_checkpoint(
                        f"{ckpt_dir}/best_params",
                        {"params": state.policy_params},
                    )
                    with open(f"{ckpt_dir}/best_score.json", "w") as f:
                        json.dump({"score": best_score, "update": i}, f)
                    print(
                        f"new best mean driving score {best_score:.1f} "
                        f"at update {i}", file=sys.stderr,
                    )
        metrics = {**metrics, **eval_metrics}
        writer.write(i, metrics)

        steps_done = i * tcfg.num_steps
        fps = steps_done / max(time.time() - t0, 1e-9)
        print(
            f"update {i}/{n_updates}  steps {steps_done}  fps {fps:.0f}  "
            f"ep_rew {float(metrics['ep_reward_mean']):.3f}  "
            f"eval_rew {eval_metrics['eval/reward']:.3f}  "
            f"wd {float(metrics['disc/post_val_wd']):.4f}",
            file=sys.stderr,
        )
        if ckpt_dir and (i % tcfg.eval_interval == 0 or i == n_updates):
            ckpt_mod.save_checkpoint(
                f"{ckpt_dir}/update_{i}", state, time.time() - t0
            )
            ckpt_mod.prune_checkpoints(ckpt_dir, keep=ckpt_keep)
    writer.close()
    return state, metrics


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="smoke",
                   choices=list(make_presets().keys()))
    p.add_argument("--params", default=None,
                   help="reference-schema params_variable.json")
    p.add_argument("--max-updates", type=int, default=None)
    p.add_argument("--log-dir", default="runs/wdgail")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of update 2")
    p.add_argument("--compliant-demos", action="store_true",
                   help="expert demos obey signals (obey_signals=True)")
    p.add_argument("--obs-mode", default=None,
                   choices=["bev", "bev6", "state"],
                   help="override the preset's observation mode")
    p.add_argument("--eval-all-routes", action="store_true",
                   help="run a leaderboard-table eval over every route "
                        "each eval_interval and keep the best checkpoint")
    p.add_argument("--terminal-mode", default=None,
                   choices=["leaderboard", "valeo", "valeo_nodetpx",
                            "leaderboard_dagger"],
                   help="override the preset's terminal handler (e.g. "
                        "leaderboard_dagger ends episodes on red lights, "
                        "terminal/leaderboard_dagger.py:24-37)")
    p.add_argument("--init-params", default=None,
                   help="warm-start the policy from a params-only "
                        "checkpoint (e.g. <ckpt-dir>/best_params)")
    p.add_argument("--gail-reward-shift", type=float, default=None,
                   help="constant added to the GAIL reward (survival "
                        "bias; needed with infraction-terminating "
                        "terminal modes — see TrainConfig)")
    p.add_argument("--resume", action="store_true",
                   help="resume FULL training state (policy, disc, "
                        "optimizers, env states, update counter) from "
                        "the newest update_* checkpoint in --ckpt-dir")
    p.add_argument("--disc-lr-decay", action="store_true",
                   help="linear discriminator LR decay over the run "
                        "(WGAN stabiliser; TrainConfig."
                        "gail_use_linear_lr_decay)")
    p.add_argument("--norm-gail-reward", action="store_true",
                   help="normalise the GAIL reward by its running std "
                        "before the shift (TrainConfig.gail_norm_reward)")
    p.add_argument("--eval-seeds", type=int, default=1,
                   help="envs per route in the --eval-all-routes "
                        "leaderboard eval (multi-seed mean reduces "
                        "best-checkpoint selection noise)")
    p.add_argument("--eval-chunk", type=int, default=0,
                   help="max envs per evaluate_policy call in the "
                        "--eval-all-routes table (0 = one shot); big "
                        "towns x long caps can OOM the TPU worker in a "
                        "single 40-env scan")
    p.add_argument("--seed", type=int, default=None,
                   help="training seed (TrainConfig.seed: net init, "
                        "rollout sampling, demo generation)")
    p.add_argument("--eval-interval", type=int, default=None,
                   help="updates between leaderboard evals / checkpoints "
                        "(TrainConfig.eval_interval, default 3)")
    p.add_argument("--demo-tree", default=None,
                   help="train from an on-disk gail_experts/ PNG tree "
                        "(tools/gen_trajectories.py output — the "
                        "reference's ExpertDataset input format) instead "
                        "of generating demos on device")
    p.add_argument("--npc-vehicles", type=int, default=None,
                   help="background NPC vehicles per world during "
                        "training, demos AND eval (the reference's "
                        "leaderboard_env.py:34-49 zeroes these; NoCrash "
                        "regular tier is 20/15 per nocrash_env.py:29-55). "
                        "Demos need --compliant-demos so the expert "
                        "hazard-brakes (agents/autopilot.py:240-255)")
    p.add_argument("--npc-walkers", type=int, default=None,
                   help="background NPC walkers per world (see "
                        "--npc-vehicles)")
    p.add_argument("--routes", default=None,
                   help="comma-separated training route ids, overriding "
                        "the preset (reference: params_variable.json:13 "
                        "lists the demo routes; routes the expert cannot "
                        "complete contribute zero demos, algo/expert.py)")
    p.add_argument("--eval-route", type=int, default=None,
                   help="held-out route id (TrainConfig.eval_route)")
    p.add_argument("--n-envs", type=int, default=None,
                   help="training envs; route assignment round-robins "
                        "routes[env_id %% len(routes)] (tools/envs.py:29-"
                        "33), so a multiple of len(routes) covers every "
                        "training route each rollout")
    args = p.parse_args(argv)

    preset = make_presets()[args.preset]
    tcfg = preset["train"]
    if args.params:
        tcfg = TrainConfig.from_json(args.params)
    if args.gail_reward_shift is not None:
        tcfg = dataclasses.replace(
            tcfg, gail_reward_shift=args.gail_reward_shift
        )
    if args.resume:
        tcfg = dataclasses.replace(tcfg, resume_training=True)
    if args.seed is not None:
        tcfg = dataclasses.replace(tcfg, seed=args.seed)
    if args.disc_lr_decay:
        tcfg = dataclasses.replace(tcfg, gail_use_linear_lr_decay=True)
    if args.norm_gail_reward:
        tcfg = dataclasses.replace(tcfg, gail_norm_reward=True)
    if args.eval_interval:
        tcfg = dataclasses.replace(tcfg, eval_interval=args.eval_interval)
    if args.routes:
        tcfg = dataclasses.replace(
            tcfg, routes=tuple(int(r) for r in args.routes.split(","))
        )
    if args.eval_route is not None:
        tcfg = dataclasses.replace(tcfg, eval_route=args.eval_route)
    if args.n_envs is not None:
        tcfg = dataclasses.replace(tcfg, n_envs=args.n_envs)
    if args.max_updates and (args.disc_lr_decay
                             or tcfg.use_linear_lr_decay):
        # LR schedules decay over n_updates = num_env_steps / num_steps;
        # align that horizon with the ACTUAL run length so the decay
        # reaches ~0 by the end instead of stalling at ~80%
        tcfg = dataclasses.replace(
            tcfg, num_env_steps=args.max_updates * tcfg.num_steps
        )
    env_cfg = preset["env"]
    if args.obs_mode:
        env_cfg = dataclasses.replace(env_cfg, obs_mode=args.obs_mode)
    if args.terminal_mode:
        env_cfg = dataclasses.replace(
            env_cfg, terminal_mode=args.terminal_mode
        )
    if args.npc_vehicles is not None:
        env_cfg = dataclasses.replace(
            env_cfg, n_npc_vehicles=args.npc_vehicles
        )
    if args.npc_walkers is not None:
        env_cfg = dataclasses.replace(
            env_cfg, n_npc_walkers=args.npc_walkers
        )
    run(
        env_cfg, preset["model"], tcfg, preset["scene"],
        preset["demo_steps"], max_updates=args.max_updates,
        log_dir=args.log_dir, ckpt_dir=args.ckpt_dir,
        profile=args.profile, demo_obey_signals=args.compliant_demos,
        eval_all_routes=args.eval_all_routes,
        init_params=args.init_params,
        eval_seeds=args.eval_seeds,
        demo_tree=args.demo_tree,
        eval_chunk=args.eval_chunk,
    )


if __name__ == "__main__":
    main()
