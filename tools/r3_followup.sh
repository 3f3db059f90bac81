#!/bin/bash
# Round-3 follow-up TPU queue — runs after tools/r3_town01_pipeline.sh
# releases the chip. Sequential (one chip, one host CPU):
#   1. Town03 expert ceiling re-measure (the round-3 signal-geometry +
#      mask-splice fixes claim to repair it from 16.3)
#   2. gated on the ceiling: Town03 multi-lane training (VERDICT r2
#      next-step #3; target driving score >= 40 vs 3.7 zero-shot)
#   3. NoCrash Town01 success-rate table with the seed-0 Town01 policy
#      (VERDICT r2 next-step #4)
#   4. file-demo training parity: export a gail_experts tree, train from
#      it, eval (VERDICT r2 next-step #8)
# Usage: bash tools/r3_followup.sh  (waits for any running train.py)
set -u
cd /root/repo
mkdir -p docs/results/logs

# wait for the Town01 pipeline to release the chip (PID recorded at
# launch; kill -0 only probes liveness)
for PIDFILE in /tmp/pipeline.pid /tmp/pipeline_s1.pid; do
  if [ -f "$PIDFILE" ]; then
    while kill -0 "$(cat $PIDFILE)" 2>/dev/null; do sleep 60; done
  fi
done

echo "=== Town03 expert ceiling ==="
if [ ! -f docs/results/r3_town03_expert.json ]; then
  python -m gail_carla_tpu.tools.benchmark_policy --town Town03 \
    --obs-mode bev6 --expert --episodes 1 \
    > docs/results/r3_town03_expert.json \
    2> docs/results/logs/r3_town03_expert.log || exit 1
fi
CEIL=$(python -c "import json;print(json.load(open('docs/results/r3_town03_expert.json'))['mean_driving_score'])")
echo "Town03 expert ceiling: $CEIL"

OK=$(python -c "print(1 if float('$CEIL') >= 60.0 else 0)")
if [ "$OK" = "1" ]; then
  T3=runs/r3_town03
  if [ ! -d "$T3/ckpt/best_params" ]; then
    echo "=== Town03 training (fresh, stabilizers) ==="
    python -m gail_carla_tpu.train --preset town03 --obs-mode bev6 \
      --compliant-demos --eval-all-routes --eval-seeds 2 \
      --disc-lr-decay --norm-gail-reward --seed 0 \
      --max-updates 130 \
      --log-dir $T3 --ckpt-dir $T3/ckpt \
      > docs/results/logs/r3_town03_train.log 2>&1 || exit 1
  fi
  python -m gail_carla_tpu.tools.benchmark_policy --town Town03 \
    --obs-mode bev6 --episodes 3 --ckpt $T3/ckpt/best_params \
    > docs/results/r3_town03_trained.json \
    2> docs/results/logs/r3_town03_eval.log || exit 1
else
  echo "Town03 expert ceiling $CEIL < 60 — skipping training (fix scenes first)"
fi

# seed-0 best params: prefer the live run dir, fall back to the
# committed artifact (runs/ was reset between round-3 sessions)
CKPT=runs/r3c_s0_stage2/ckpt/best_params
[ -d "$CKPT" ] || CKPT=docs/results/ckpts/r3_town01_s0_best_params
if [ -d "$CKPT" ]; then
  for TOWN in Town01 Town02; do
    LOW=$(echo $TOWN | tr 'A-Z' 'a-z')
    if [ ! -f docs/results/r3_nocrash_${LOW}.json ]; then
      echo "=== NoCrash $TOWN table ==="
      python -m gail_carla_tpu.tools.nocrash_bench --ckpt $CKPT \
        --town $TOWN --obs-mode bev6 --episodes 2 \
        > docs/results/r3_nocrash_${LOW}.json \
        2> docs/results/logs/r3_nocrash_${LOW}.log || exit 1
    fi
  done
fi

echo "=== file-demo parity: export tree + train from it ==="
if [ ! -d runs/r3_experts_town01 ]; then
  python -m gail_carla_tpu.tools.gen_trajectories --town Town01 \
    --out runs/r3_experts_town01 --routes 10 --no-cameras --compliant \
    > docs/results/logs/r3_gen_tree.log 2>&1 || exit 1
fi
FD=runs/r3_filedemo
if [ ! -d "$FD/ckpt/best_params" ]; then
  python -m gail_carla_tpu.train --preset town01 --obs-mode bev6 \
    --demo-tree runs/r3_experts_town01 --eval-all-routes --eval-seeds 2 \
    --disc-lr-decay --norm-gail-reward --seed 0 \
    --max-updates 130 \
    --log-dir $FD --ckpt-dir $FD/ckpt \
    > docs/results/logs/r3_filedemo_train.log 2>&1 || exit 1
fi
python -m gail_carla_tpu.tools.benchmark_policy --town Town01 \
  --obs-mode bev6 --episodes 3 --ckpt $FD/ckpt/best_params \
  > docs/results/r3_filedemo_eval.json \
  2> docs/results/logs/r3_filedemo_eval.log || exit 1
echo "followup done"
