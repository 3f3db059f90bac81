#!/bin/bash
# Round-3 file-demo training parity (VERDICT r2 next-step #8).
#
# Same two-stage recipe as tools/r3_town01_pipeline.sh, but the expert
# demos come from an on-disk gail_experts/ PNG tree (the reference's
# actual input path: wdail_carla.py:159 + ExpertDataset
# algo/wdgail.py:192-241) instead of being generated on device. The tree
# itself was exported by tools/gen_trajectories.py --compliant, so pixel
# content matches the on-device compliant demos; what this certifies is
# the full file interop path (PNG round-trip -> ExpertBuffer -> training).
#
# Usage: bash tools/r3_filedemo_pipeline.sh  (one chip; ~1.5 h)
set -u
cd /root/repo
mkdir -p docs/results/logs

TREE=runs/r3_experts_town01
if [ ! -d "$TREE" ]; then
  echo "=== exporting compliant Town01 expert tree ==="
  python -m gail_carla_tpu.tools.gen_trajectories --town Town01 \
    --out $TREE --routes 10 --no-cameras --compliant \
    > docs/results/logs/r3_gen_tree.log 2>&1 || exit 1
fi

S1=runs/r3fd_stage1
S2=runs/r3fd_stage2

if [ ! -d "$S1/ckpt/best_params" ]; then
  echo "=== file-demo stage 1 (leaderboard, fresh init) ==="
  python -m gail_carla_tpu.train --preset town01 --obs-mode bev6 \
    --demo-tree $TREE --eval-all-routes --eval-seeds 2 \
    --disc-lr-decay --norm-gail-reward --seed 0 \
    --max-updates 130 \
    --log-dir $S1 --ckpt-dir $S1/ckpt \
    > docs/results/logs/r3fd_stage1.log 2>&1 || exit 1
fi

if [ ! -d "$S2/ckpt/best_params" ]; then
  echo "=== file-demo stage 2 (dagger warm start) ==="
  python -m gail_carla_tpu.train --preset town01 --obs-mode bev6 \
    --demo-tree $TREE --eval-all-routes --eval-seeds 2 \
    --terminal-mode leaderboard_dagger --gail-reward-shift 2.5 \
    --disc-lr-decay --norm-gail-reward --seed 0 \
    --init-params $S1/ckpt/best_params --max-updates 110 \
    --log-dir $S2 --ckpt-dir $S2/ckpt \
    > docs/results/logs/r3fd_stage2.log 2>&1 || exit 1
fi

echo "=== file-demo final 5-seed leaderboard eval ==="
python -m gail_carla_tpu.tools.benchmark_policy --town Town01 \
  --obs-mode bev6 --episodes 5 --ckpt $S2/ckpt/best_params \
  > docs/results/r3_filedemo_eval.json \
  2> docs/results/logs/r3fd_finaleval.log || exit 1
echo "filedemo pipeline done"
