#!/bin/bash
# Round-4 Town03 training on the repaired scene (VERDICT r3 next-steps
# #1/#2): the round-4 geometry work (robust boundary signs, pose-based
# hard-surface repair, median-gap closing, snapped mask planner) rebuilt
# every Town03 route, so this pipeline re-derives everything from the
# fresh scene: expert ceiling -> training-route set -> dagger training ->
# final 3-seed eval.
#
# Provenance (VERDICT r3 weak #5): every stage COMMITS its log + JSON at
# the stage boundary — no stage's only record lives in a mutable runs/
# directory.
#
# Usage: bash tools/r4_town03_pipeline.sh [seed] [max_updates]
set -u
cd /root/repo
mkdir -p docs/results/logs docs/results/ckpts
SEED="${1:-0}"
MAXUP="${2:-300}"

commit_stage() {  # commit_stage <message> <paths...>
  local msg="$1"; shift
  git add -f "$@" && git commit -q -m "$msg" || true
}

run_stage() {  # run_stage <log> <cmd...>: retry twice with --resume
  local log="$1"; shift
  "$@" >"$log" 2>&1 && return 0
  for attempt in 2 3; do
    echo "=== stage attempt $attempt (resume) ===" >>"$log"
    "$@" --resume >>"$log" 2>&1 && return 0
  done
  return 1
}

# --- stage 0: expert ceiling on the current scene (1 ep/route, the
#     demo-generation cap) + the trainable route set derived from it ---
EXP=docs/results/r4_town03_expert.json
if [ ! -f "$EXP" ]; then
  echo "=== town03: expert ceiling ==="
  python -m gail_carla_tpu.tools.benchmark_policy --town Town03 \
    --expert --episodes 1 --max-steps 6000 \
    > "$EXP" 2> docs/results/logs/r4t3_expert.log || exit 1
  commit_stage "Town03 r4 expert ceiling on repaired scene" \
    "$EXP" docs/results/logs/r4t3_expert.log
fi
# training routes = routes the expert completes (>=95 route score) PLUS
# clean timeout-completes (no infractions, >=80% route covered at the
# 6000-step cap — e.g. route 3 at 92.8, a long route, not a failure);
# route 13 stays the held-out eval route (town01-shaped protocol)
ROUTES=$(python - "$EXP" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
rs = [i for i, r in enumerate(d["routes"])
      if i != 13 and (
          r.get("route_score", 0) >= 95.0
          or (r.get("penalty", 0) >= 99.9 and r.get("route_score", 0) >= 80.0)
      )]
print(",".join(str(i) for i in rs))
PY
)
echo "training routes: $ROUTES (eval route 13)"

S=runs/r4t3_s${SEED}
if [ ! -d "$S/ckpt/best_params" ] || [ -f "$S/ckpt/INCOMPLETE" ]; then
  echo "=== town03 seed $SEED: dagger training ($MAXUP updates) ==="
  touch "$S/ckpt/INCOMPLETE" 2>/dev/null || true
  run_stage docs/results/logs/r4t3_s${SEED}_train.log \
    python -m gail_carla_tpu.train --preset town03 --obs-mode bev6 \
    --compliant-demos --eval-all-routes --eval-seeds 2 --eval-chunk 20 \
    --routes "$ROUTES" --eval-route 13 --n-envs 16 \
    --terminal-mode leaderboard_dagger --gail-reward-shift 2.5 \
    --disc-lr-decay --norm-gail-reward --seed "$SEED" \
    --init-params docs/results/ckpts/r3_town03_s0_best_params \
    --max-updates "$MAXUP" \
    --log-dir "$S" --ckpt-dir "$S/ckpt" || exit 1
  rm -f "$S/ckpt/INCOMPLETE"
  commit_stage "Town03 r4 seed $SEED training log" \
    docs/results/logs/r4t3_s${SEED}_train.log
fi

echo "=== town03 seed $SEED: final 3-seed eval, all 20 routes ==="
python -m gail_carla_tpu.tools.benchmark_policy --town Town03 \
  --obs-mode bev6 --episodes 3 --max-steps 6000 \
  --ckpt "$S/ckpt/best_params" \
  > docs/results/r4_town03_trained_s${SEED}.json \
  2> docs/results/logs/r4t3_s${SEED}_finaleval.log || exit 1
cp -r "$S/ckpt/best_params" \
  docs/results/ckpts/r4_town03_s${SEED}_best_params
commit_stage "Town03 r4 seed $SEED final eval + checkpoint" \
  docs/results/r4_town03_trained_s${SEED}.json \
  docs/results/logs/r4t3_s${SEED}_finaleval.log \
  docs/results/ckpts/r4_town03_s${SEED}_best_params
echo "town03 r4 pipeline done"
