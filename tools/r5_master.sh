#!/bin/bash
# Round-5 master chain: waits for the Town03 pipeline to release the
# chip, then runs the re-certification queue blocks in VERDICT priority
# order, then the Town04 training pipeline (time-boxed by its MAXUP
# argument). Serial by construction — one v5e, one job at a time.
set -u
cd /root/repo
T3_PID="${1:?pid of the running town03 pipeline}"
T4_MAXUP="${2:-60}"

while kill -0 "$T3_PID" 2>/dev/null; do sleep 30; done
echo "town03 pipeline finished at $(date)"

# VERDICT priority: Town01 recert (A), dense shapes (C), NoCrash tables
# (B), then Town04 training, then towns 04-06 ceilings (E) and CoRL (D)
# with whatever wall clock remains. The queue is idempotent ([ -s ]
# guards per artifact), so re-entry is safe.
BLOCKS=ACB bash tools/r5_recert_queue.sh > /tmp/r5_queue.log 2>&1
echo "recert queue ACB rc=$? at $(date)"

bash tools/r5_town04_pipeline.sh 0 "$T4_MAXUP" > /tmp/r5_t4.log 2>&1
echo "town04 pipeline rc=$? at $(date)"

BLOCKS=ED bash tools/r5_recert_queue.sh > /tmp/r5_queue2.log 2>&1
echo "recert queue ED rc=$? at $(date)"
