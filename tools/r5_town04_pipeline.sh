#!/bin/bash
# Round-5 Town04 training (VERDICT r4 next-step #4): the first highway
# multi-lane town this framework trains on (round-2 zero-shot stood at
# 6.4). Same shape as the Town03 pipeline: expert ceiling (produced by
# tools/r5_recert_queue.sh block E) -> trainable route set -> dagger
# training warm-started from the Town01 policy -> 3-seed eval.
# Usage: bash tools/r5_town04_pipeline.sh [seed] [max_updates]
set -u
cd /root/repo
mkdir -p docs/results/logs docs/results/ckpts
SEED="${1:-0}"
MAXUP="${2:-150}"

commit_stage() { local msg="$1"; shift; git add -f "$@" && git commit -q -m "$msg" || true; }

EXP=docs/results/r5_town04_expert.json
if [ ! -s "$EXP" ]; then
  echo "=== town04: expert ceiling ==="
  python -m gail_carla_tpu.tools.benchmark_policy --town Town04 \
    --expert --episodes 1 --max-steps 6000 \
    > "$EXP" 2> docs/results/logs/r5_town04_expert.log || exit 1
  commit_stage "Town04 expert ceiling" "$EXP" docs/results/logs/r5_town04_expert.log
fi
# training routes: expert-complete (>=95) plus clean timeout-completes;
# eval route = the highest-index completing route, held out
read -r ROUTES EVALR <<<"$(python - "$EXP" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
ok = [i for i, r in enumerate(d["routes"])
      if r.get("route_score", 0) >= 95.0
      or (r.get("penalty", 0) >= 99.9 and r.get("route_score", 0) >= 80.0)]
if len(ok) < 2:
    print("NONE -1"); raise SystemExit
ev = ok[-1]
print(",".join(str(i) for i in ok if i != ev), ev)
PY
)"
if [ "$ROUTES" = "NONE" ]; then echo "too few expert-complete routes"; exit 1; fi
echo "training routes: $ROUTES (eval route $EVALR)"

S=runs/r5t4_s${SEED}
if [ ! -d "$S/ckpt/best_params" ] || [ -f "$S/ckpt/INCOMPLETE" ]; then
  echo "=== town04 seed $SEED: dagger training ($MAXUP updates) ==="
  mkdir -p "$S/ckpt"; touch "$S/ckpt/INCOMPLETE"
  RESUME=""
  [ -d "$S/ckpt/best_params" ] && RESUME="--resume"
  python -m gail_carla_tpu.train --preset town04 --obs-mode bev6 \
    --compliant-demos --eval-all-routes --eval-seeds 2 --eval-chunk 20 \
    --routes "$ROUTES" --eval-route "$EVALR" --n-envs 16 \
    --terminal-mode leaderboard_dagger --gail-reward-shift 2.5 \
    --disc-lr-decay --norm-gail-reward --seed "$SEED" \
    --init-params docs/results/ckpts/r3_town01_s0_best_params \
    --max-updates "$MAXUP" $RESUME \
    --log-dir "$S" --ckpt-dir "$S/ckpt" \
    > docs/results/logs/r5t4_s${SEED}_train.log 2>&1 || exit 1
  rm -f "$S/ckpt/INCOMPLETE"
  commit_stage "Town04 seed $SEED training log" \
    docs/results/logs/r5t4_s${SEED}_train.log
fi

echo "=== town04 seed $SEED: final 3-seed eval ==="
python -m gail_carla_tpu.tools.benchmark_policy --town Town04 \
  --obs-mode bev6 --episodes 3 --max-steps 6000 \
  --ckpt "$S/ckpt/best_params" \
  > docs/results/r5_town04_trained_s${SEED}.json \
  2> docs/results/logs/r5t4_s${SEED}_finaleval.log || exit 1
cp -r "$S/ckpt/best_params" docs/results/ckpts/r5_town04_s${SEED}_best_params
commit_stage "Town04 seed $SEED final eval + checkpoint" \
  docs/results/r5_town04_trained_s${SEED}.json \
  docs/results/logs/r5t4_s${SEED}_finaleval.log \
  docs/results/ckpts/r5_town04_s${SEED}_best_params
echo "town04 r5 pipeline done"
