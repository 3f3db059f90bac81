#!/bin/bash
# Round-5 re-certification queue (VERDICT r4 next-steps #2/#3/#4/#5):
# every committed driving-score table predates the round-4/5 geometry
# (robust boundary signs, 3-stage route repair, splice command fix), and
# the NoCrash dense/leaderboard tiers were never run at reference
# densities after the uncap. This chains the cheap TPU evals:
#   A. Town01 leaderboard re-cert of the r3 checkpoints (5 eps/route)
#   B. NoCrash tables Town01/02, ALL FOUR tiers at reference densities
#      (nocrash_env.py:29-55) — trained policy + expert ceiling
#   C. Dense-tier shape bench (compile s / steps/s / HBM) — the
#      measurement that justifies the round-4 uncap
#   D. CoRL2017 tables (corl2017_env.py:7-72): expert ceilings + trained
#      (traffic ckpt for navigation_dynamic, town01 ckpt for statics)
#   E. Towns 04/05/06 expert ceilings (leaderboard_env.py:7-97)
# Each block commits its own artifacts (VERDICT r3 weak #5 provenance).
set -u
cd /root/repo
mkdir -p docs/results/logs
CK_T1=docs/results/ckpts/r3_town01_s0_best_params
CK_T1B=docs/results/ckpts/r3_town01_s1_best_params
CK_NC=docs/results/ckpts/r3_nocrash_s0_best_params

commit_stage() { local msg="$1"; shift; git add -f "$@" && git commit -q -m "$msg" || true; }

[[ "${BLOCKS:-ACBED}" == *A* ]] && {
# --- A: Town01 re-cert ---
for s in 0 1; do
  ck=docs/results/ckpts/r3_town01_s${s}_best_params
  out=docs/results/r5_town01_recert_s${s}.json
  [ -s "$out" ] || python -m gail_carla_tpu.tools.benchmark_policy \
    --town Town01 --obs-mode bev6 --episodes 5 --ckpt "$ck" \
    > "$out" 2> docs/results/logs/r5_town01_recert_s${s}.log || exit 1
done
commit_stage "Town01 re-certification of r3 checkpoints on round-5 geometry" \
  docs/results/r5_town01_recert_s0.json docs/results/r5_town01_recert_s1.json \
  docs/results/logs/r5_town01_recert_s0.log docs/results/logs/r5_town01_recert_s1.log

}
[[ "${BLOCKS:-ACBED}" == *C* ]] && {
# --- C first (cheap, justifies B's dense runs) ---
out=docs/results/r5_dense_shapes.json
[ -s "$out" ] || python tools/r5_dense_shape_bench.py \
  > "$out" 2> docs/results/logs/r5_dense_shapes.log || exit 1
commit_stage "Uncapped NoCrash tier shape bench (compile/steps-per-s/HBM)" \
  "$out" docs/results/logs/r5_dense_shapes.log

}
[[ "${BLOCKS:-ACBED}" == *B* ]] && {
# --- B: NoCrash tables at reference densities ---
for t in Town01 Town02; do
  out=docs/results/r5_nocrash_${t,,}.json
  [ -s "$out" ] || python -m gail_carla_tpu.tools.nocrash_bench \
    --ckpt "$CK_NC" --town "$t" --obs-mode bev6 --episodes 2 \
    > "$out" 2> docs/results/logs/r5_nocrash_${t,,}.log || exit 1
  oute=docs/results/r5_nocrash_expert_${t,,}.json
  [ -s "$oute" ] || python -m gail_carla_tpu.tools.nocrash_bench \
    --expert --town "$t" --episodes 2 \
    > "$oute" 2> docs/results/logs/r5_nocrash_expert_${t,,}.log || exit 1
done
commit_stage "NoCrash tables at uncapped reference densities (all four tiers)" \
  docs/results/r5_nocrash_town01.json docs/results/r5_nocrash_town02.json \
  docs/results/r5_nocrash_expert_town01.json docs/results/r5_nocrash_expert_town02.json \
  docs/results/logs/r5_nocrash_*.log

}
[[ "${BLOCKS:-ACBED}" == *E* ]] && {
# --- E: Towns 04/05/06 expert ceilings ---
declare -A PACK=( [Town04]=routes_training.xml [Town05]=routes_testing.xml \
                  [Town06]=routes_training.xml )
for t in Town04 Town05 Town06; do
  out=docs/results/r5_${t,,}_expert.json
  [ -s "$out" ] || python -m gail_carla_tpu.tools.benchmark_policy \
    --town "$t" --route-file "${PACK[$t]}" --expert --episodes 1 \
    --max-steps 6000 \
    > "$out" 2> docs/results/logs/r5_${t,,}_expert.log || exit 1
done
commit_stage "Towns 04/05/06 expert ceilings on round-5 geometry" \
  docs/results/r5_town04_expert.json docs/results/r5_town05_expert.json \
  docs/results/r5_town06_expert.json docs/results/logs/r5_town0*_expert.log
}
[[ "${BLOCKS:-ACBED}" == *D* ]] && {
# --- D: CoRL2017 tables ---
for t in Town01 Town02; do
  oute=docs/results/r5_corl_expert_${t,,}.json
  [ -s "$oute" ] || python -m gail_carla_tpu.tools.corl_bench \
    --expert --town "$t" --episodes 2 \
    > "$oute" 2> docs/results/logs/r5_corl_expert_${t,,}.log || exit 1
  # statics with the Town01 leaderboard ckpt
  outs=docs/results/r5_corl_static_${t,,}.json
  [ -s "$outs" ] || { python -m gail_carla_tpu.tools.corl_bench \
      --ckpt "$CK_T1" --town "$t" --obs-mode bev6 --episodes 2 \
      --task straight > "$outs.tmp1" \
      2> docs/results/logs/r5_corl_static_${t,,}.log \
    && python -m gail_carla_tpu.tools.corl_bench \
      --ckpt "$CK_T1" --town "$t" --obs-mode bev6 --episodes 2 \
      --task one_curve > "$outs.tmp2" \
      2>> docs/results/logs/r5_corl_static_${t,,}.log \
    && python -m gail_carla_tpu.tools.corl_bench \
      --ckpt "$CK_T1" --town "$t" --obs-mode bev6 --episodes 2 \
      --task navigation > "$outs.tmp3" \
      2>> docs/results/logs/r5_corl_static_${t,,}.log \
    && cat "$outs".tmp1 "$outs".tmp2 "$outs".tmp3 > "$outs" \
    && rm -f "$outs".tmp*; } || exit 1
  # navigation_dynamic with the traffic-aware ckpt
  outd=docs/results/r5_corl_dynamic_${t,,}.json
  [ -s "$outd" ] || python -m gail_carla_tpu.tools.corl_bench \
    --ckpt "$CK_NC" --town "$t" --obs-mode bev6 --episodes 2 \
    --task navigation_dynamic > "$outd" \
    2> docs/results/logs/r5_corl_dynamic_${t,,}.log || exit 1
done
commit_stage "CoRL2017 measured tables (expert ceilings + trained policies)" \
  docs/results/r5_corl_*.json docs/results/logs/r5_corl_*.log

}
echo "r5 recert queue done"
