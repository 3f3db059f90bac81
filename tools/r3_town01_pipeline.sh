#!/bin/bash
# Round-3 Town01 two-seed reproduction pipeline (VERDICT r2 next-step #2).
#
# Recipe per seed (RESULTS.md "Round 3 reproduction"):
#   1. stage 1: leaderboard-terminal WDGAIL from a FRESH init, bev6 obs,
#      compliant demos, WGAN stabilizers (disc LR decay + shifted-reward
#      normalization via the clamped-EMA scale tracker).
#      Fresh init matters: a random policy is trivially separable, so the
#      discriminator's reward is discriminative from update 1. A BC-warm-
#      started policy sits ON the expert manifold — wd ~ 0 for the first
#      ~20 updates, the softplus reward is uniformly positive, and the
#      only remaining signal (survival) steers the policy into the
#      901-step sit-still Blocked timeout (measured:
#      docs/results/logs/r3b_s0_stage1_bcinit.log). If a fresh seed
#      nevertheless hatches into sit-still (ep lengths pinned at 901 by
#      update ~15), BC warm-start (learn_bc now clips gradients) is the
#      documented fallback — pass it via --init-params by hand.
#   2. stage 2: leaderboard_dagger warm start from stage-1 best params,
#      gail_reward_shift 2.5, same stabilizers
#   3. final 5-seed-per-route leaderboard eval -> docs/results JSON
#
# Runs seeds sequentially (one chip). Usage: bash tools/r3_town01_pipeline.sh
set -u
cd /root/repo
mkdir -p docs/results/logs docs/results/ckpts

# Seeds may be passed as arguments (default: 0 1). Useful when one seed's
# artifacts are already committed and runs/ was reset.
SEEDS="${@:-0 1}"
for SEED in $SEEDS; do
  S1=runs/r3c_s${SEED}_stage1
  S2=runs/r3c_s${SEED}_stage2

  if [ ! -d "$S1/ckpt/best_params" ]; then
    echo "=== seed $SEED: stage 1 (leaderboard, fresh init) ==="
    python -m gail_carla_tpu.train --preset town01 --obs-mode bev6 \
      --compliant-demos --eval-all-routes --eval-seeds 2 \
      --disc-lr-decay --norm-gail-reward --seed $SEED \
      --max-updates 130 \
      --log-dir $S1 --ckpt-dir $S1/ckpt \
      > docs/results/logs/r3c_s${SEED}_stage1.log 2>&1 || exit 1
  fi

  if [ ! -d "$S2/ckpt/best_params" ]; then
    echo "=== seed $SEED: stage 2 (dagger warm start) ==="
    python -m gail_carla_tpu.train --preset town01 --obs-mode bev6 \
      --compliant-demos --eval-all-routes --eval-seeds 2 \
      --terminal-mode leaderboard_dagger --gail-reward-shift 2.5 \
      --disc-lr-decay --norm-gail-reward --seed $SEED \
      --init-params $S1/ckpt/best_params --max-updates 110 \
      --log-dir $S2 --ckpt-dir $S2/ckpt \
      > docs/results/logs/r3c_s${SEED}_stage2.log 2>&1 || exit 1
  fi

  echo "=== seed $SEED: final 5-seed leaderboard eval ==="
  python -m gail_carla_tpu.tools.benchmark_policy --town Town01 \
    --obs-mode bev6 --episodes 5 --ckpt $S2/ckpt/best_params \
    > docs/results/r3_leaderboard_s${SEED}_best.json \
    2> docs/results/logs/r3c_s${SEED}_finaleval.log || exit 1

  # keep the policy params (small) as a committable artifact
  cp -r $S2/ckpt/best_params docs/results/ckpts/r3_town01_s${SEED}_best_params
done
echo "pipeline done"
